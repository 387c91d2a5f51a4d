"""On-device volumetric preprocessing ops (jittable, XLA-compiled).

TPU-native replacements for the reference's MONAI/CPU preprocessing
pipeline (reference: dataloader/threed_loader.py:55-66,
utils/data_normalization.py:20-48):

* ``adaptive_normal``    -- percentile intensity windowing to [-1, 1]
* ``scale_intensity_range`` -- MONAI ScaleIntensityRanged
* ``resize_volume``      -- MONAI Resized (half-pixel linear resampling)
* ``crop_foreground``    -- host-side bbox of the foreground (MONAI
  CropForegroundd), plus a fused jittable ``crop_resize`` that resamples
  directly from a (possibly traced) bounding box so the whole
  crop+resize runs on device with static output shapes.

All functions accept arrays with or without a trailing channel dim; the
spatial dims are the leading (or only) dims, channels-last.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def adaptive_normal(img: Array, min_p: float = 0.001, max_p: float = 0.999) -> Array:
    """Percentile windowing to [-1, 1] (data_normalization.py:20-48).

    Reference semantics: consider only pixels ``>= 0``, sort ascending,
    pick values at half-up-rounded indices ``(n-1)*p + 0.5`` for
    p = 0.1% / 99.9%, then affinely map [value_min, value_max] to
    [-1, 1] and clamp.  Jittable: negatives are masked to +inf before a
    full sort so the first ``n`` entries are exactly the sorted
    non-negative subset.
    """
    flat = img.reshape(-1)
    n = jnp.sum(flat >= 0)
    masked = jnp.where(flat >= 0, flat, jnp.inf)
    ordered = jnp.sort(masked)

    def pick(p):
        idx = jnp.floor((n - 1) * p + 0.5).astype(jnp.int32)
        idx = jnp.clip(idx, 0, n - 1)
        return ordered[idx]

    value_min = pick(min_p)
    value_max = pick(max_p)
    mean = (value_max + value_min) / 2.0
    stddev = (value_max - value_min) / 2.0
    # degenerate windows (no non-negative voxels, or a constant image)
    # fall back to pass-through instead of NaN (the reference would
    # index-error / divide by zero here)
    ok = (n > 0) & (stddev > 0)
    out = jnp.where(ok, (img - mean) / jnp.where(stddev > 0, stddev, 1.0), img)
    return jnp.clip(out, -1.0, 1.0)


def scale_intensity_range(img: Array, a_min: float, a_max: float,
                          b_min: float, b_max: float, clip: bool = True) -> Array:
    """MONAI ScaleIntensityRanged (threed_loader.py:63)."""
    out = (img - a_min) / (a_max - a_min)
    out = out * (b_max - b_min) + b_min
    if clip:
        out = jnp.clip(out, b_min, b_max)
    return out


def resize_volume(img: Array, spatial_size: Sequence[int],
                  method: str = "linear") -> Array:
    """Resize the leading spatial dims to ``spatial_size``.

    Accepts ``(X, Y, Z)``, ``(X, Y, Z, C)`` or batched ``(B, X, Y, Z, C)``
    input; only the spatial dims are resized.  Equivalent role to MONAI
    ``Resized`` (threed_loader.py:61); uses half-pixel-centred linear
    resampling (jax.image.resize), which XLA lowers to fused gathers.
    """
    spatial_size = tuple(spatial_size)
    k = len(spatial_size)
    if img.ndim == k:
        target = spatial_size
    elif img.ndim == k + 1:
        target = spatial_size + (img.shape[-1],)
    elif img.ndim == k + 2:
        target = (img.shape[0],) + spatial_size + (img.shape[-1],)
    else:
        raise ValueError(f"cannot resize shape {img.shape} to {spatial_size}")
    if tuple(img.shape) == tuple(target):
        return img
    return jax.image.resize(img, target, method=method)


def foreground_bbox(label: np.ndarray, select_fn=lambda x: x > 0,
                    margin: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Host-side foreground bounding box (MONAI CropForegroundd default
    ``select_fn=lambda x: x > 0``). Returns (start, stop) index arrays
    over the spatial dims."""
    mask = select_fn(np.asarray(label))
    if mask.ndim > 3:  # channel dim trailing
        mask = mask.any(axis=tuple(range(3, mask.ndim)))
    coords = np.nonzero(mask)
    ndim = mask.ndim
    if len(coords[0]) == 0:
        return np.zeros(ndim, np.int64), np.array(mask.shape, np.int64)
    start = np.array([max(int(c.min()) - margin, 0) for c in coords])
    stop = np.array(
        [min(int(c.max()) + 1 + margin, s) for c, s in zip(coords, mask.shape)]
    )
    return start, stop


def crop_foreground(img: np.ndarray, label: np.ndarray,
                    select_fn=lambda x: x > 0) -> np.ndarray:
    """Host-side crop of ``img`` to the foreground bbox of ``label``
    (MONAI CropForegroundd, threed_loader.py:60)."""
    start, stop = foreground_bbox(label, select_fn)
    slices = tuple(slice(int(a), int(b)) for a, b in zip(start, stop))
    return np.asarray(img)[slices]


def _linear_resample_axis(x: Array, axis: int, out_size: int,
                          lo, hi) -> Array:
    """Linearly resample one axis from the (traced) window [lo, hi) to
    ``out_size`` samples at half-pixel centres (align_corners=False)."""
    span = hi - lo
    scale = span / out_size
    centers = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5 + lo
    # clamp to the window so the result equals crop-then-resize exactly
    centers = jnp.clip(centers, lo, hi - 1)
    i0 = jnp.floor(centers).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, hi - 1)
    frac = centers - i0
    x0 = jnp.take(x, i0, axis=axis)
    x1 = jnp.take(x, i1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    frac = frac.reshape(shape)
    return x0 * (1.0 - frac) + x1 * frac


def crop_resize(img: Array, start, stop, spatial_size: Sequence[int]) -> Array:
    """Fused on-device crop-to-bbox + linear resize with a static output
    shape.  ``start``/``stop`` may be traced scalars (per spatial dim),
    so a data-dependent foreground crop (CropForegroundd + Resized) jits
    into one gather chain instead of a host round-trip.
    """
    spatial_size = tuple(spatial_size)
    out = img
    for axis, size in enumerate(spatial_size):
        out = _linear_resample_axis(out, axis, size, start[axis], stop[axis])
    return out


def foreground_bbox_jax(label: Array, threshold: float = 0.0):
    """On-device foreground bbox: per-axis first/last index where any
    voxel exceeds ``threshold``.  Returns (start, stop) traced arrays
    usable with :func:`crop_resize`."""
    mask = label > threshold
    spatial_ndim = 3 if mask.ndim >= 3 else mask.ndim
    if mask.ndim > spatial_ndim:
        mask = jnp.any(mask, axis=tuple(range(spatial_ndim, mask.ndim)))
    starts, stops = [], []
    for axis in range(spatial_ndim):
        other = tuple(a for a in range(spatial_ndim) if a != axis)
        line = jnp.any(mask, axis=other)
        idx = jnp.arange(line.shape[0])
        n = line.shape[0]
        has_any = jnp.any(line)
        first = jnp.where(has_any, jnp.min(jnp.where(line, idx, n)), 0)
        last = jnp.where(has_any, jnp.max(jnp.where(line, idx, -1)) + 1, n)
        starts.append(first)
        stops.append(last)
    return jnp.stack(starts), jnp.stack(stops)
