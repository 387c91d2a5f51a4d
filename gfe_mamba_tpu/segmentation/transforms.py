"""Volumetric augmentation library (reference augment/transforms.py).

Host-side numpy augmentations matching the reference's config-driven
factory (transforms.py:692-726): RandomFlip, RandomRotate90,
RandomRotate, RandomContrast, ElasticDeformation, CropToFixed,
Standardize, PercentileNormalizer, Normalize, AdditiveGaussianNoise,
AdditivePoissonNoise, ToTensor(-> float32), and the label -> boundary
transform.  All randomized transforms draw from an explicit
``np.random.Generator`` so pipelines are reproducible.

Arrays are channels-last (X, Y, Z[, C]).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


class Transform:
    def __call__(self, m: np.ndarray) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError


class Compose(Transform):
    def __init__(self, transforms: Sequence[Transform]):
        self.transforms = list(transforms)

    def __call__(self, m):
        for t in self.transforms:
            m = t(m)
        return m


class RandomFlip(Transform):
    """Flip each spatial axis with p=0.5 (transforms.py RandomFlip)."""

    def __init__(self, rng: np.random.Generator, axis_prob: float = 0.5):
        self.rng = rng
        self.axis_prob = axis_prob

    def __call__(self, m):
        for axis in range(3):
            if self.rng.random() < self.axis_prob:
                m = np.flip(m, axis)
        return np.ascontiguousarray(m)


class RandomRotate90(Transform):
    """Rotate k*90 degrees in the XY plane (transforms.py RandomRotate90)."""

    def __init__(self, rng: np.random.Generator):
        self.rng = rng

    def __call__(self, m):
        k = int(self.rng.integers(0, 4))
        return np.ascontiguousarray(np.rot90(m, k, axes=(0, 1)))


class RandomRotate(Transform):
    """Free-angle rotation via scipy (transforms.py RandomRotate)."""

    def __init__(self, rng: np.random.Generator, angle_spectrum: int = 30,
                 axes=None, mode: str = "reflect", order: int = 0):
        self.rng = rng
        self.angle_spectrum = angle_spectrum
        self.axes = axes or [(1, 0), (2, 1), (2, 0)]
        self.mode = mode
        self.order = order

    def __call__(self, m):
        from scipy.ndimage import rotate
        axis = self.axes[self.rng.integers(len(self.axes))]
        angle = self.rng.integers(-self.angle_spectrum, self.angle_spectrum)
        return rotate(m, angle, axes=axis, reshape=False, order=self.order,
                      mode=self.mode, cval=-1)


class RandomContrast(Transform):
    """mean + alpha * (x - mean) (transforms.py RandomContrast)."""

    def __init__(self, rng: np.random.Generator, alpha=(0.5, 1.5),
                 mean: float = 0.0, execution_probability: float = 0.1):
        self.rng = rng
        self.alpha = alpha
        self.mean = mean
        self.p = execution_probability

    def __call__(self, m):
        if self.rng.random() < self.p:
            alpha = self.rng.uniform(self.alpha[0], self.alpha[1])
            m = self.mean + alpha * (m - self.mean)
            return np.clip(m, -1, 1)
        return m


class ElasticDeformation(Transform):
    """Smoothed random displacement field (transforms.py:138-190)."""

    def __init__(self, rng: np.random.Generator, spline_order: int = 3,
                 alpha: float = 2000, sigma: float = 50,
                 execution_probability: float = 0.1):
        self.rng = rng
        self.spline_order = spline_order
        self.alpha = alpha
        self.sigma = sigma
        self.p = execution_probability

    def __call__(self, m):
        if self.rng.random() >= self.p:
            return m
        from scipy.ndimage import gaussian_filter, map_coordinates
        spatial = m.shape[:3]
        offsets = [
            gaussian_filter(self.rng.standard_normal(spatial), self.sigma,
                            mode="reflect") * self.alpha
            for _ in range(3)
        ]
        grid = np.meshgrid(*[np.arange(s) for s in spatial], indexing="ij")
        coords = [g + o for g, o in zip(grid, offsets)]
        if m.ndim == 3:
            return map_coordinates(m, coords, order=self.spline_order,
                                   mode="reflect")
        chans = [map_coordinates(m[..., c], coords, order=self.spline_order,
                                 mode="reflect") for c in range(m.shape[-1])]
        return np.stack(chans, axis=-1)


class CropToFixed(Transform):
    """Random (or centered) crop to a fixed size with padding as needed
    (transforms.py CropToFixed)."""

    def __init__(self, rng: np.random.Generator, size, centered: bool = False):
        self.rng = rng
        self.size = tuple(size)
        self.centered = centered

    def __call__(self, m):
        starts, pads = [], []
        for dim, want in zip(m.shape[:3], self.size):
            if dim <= want:
                starts.append(0)
                total = want - dim
                pads.append((total // 2, total - total // 2))
            else:
                max_start = dim - want
                start = (max_start // 2 if self.centered
                         else int(self.rng.integers(0, max_start + 1)))
                starts.append(start)
                pads.append((0, 0))
        sl = tuple(slice(s, s + w) for s, w in zip(starts, self.size))
        out = m[sl]
        if any(p != (0, 0) for p in pads):
            if m.ndim == 4:
                pads = pads + [(0, 0)]
            out = np.pad(out, pads, mode="reflect")
        return out


class Standardize(Transform):
    """(x - mean) / std (transforms.py:495-...)."""

    def __init__(self, mean: float | None = None, std: float | None = None,
                 eps: float = 1e-10):
        self.mean = mean
        self.std = std
        self.eps = eps

    def __call__(self, m):
        mean = self.mean if self.mean is not None else m.mean()
        std = self.std if self.std is not None else m.std()
        return (m - mean) / np.clip(std, self.eps, None)


class PercentileNormalizer(Transform):
    """Window [pmin, pmax] percentiles to [0, 1] (transforms.py)."""

    def __init__(self, pmin: float = 1, pmax: float = 99.6,
                 channel_wise: bool = False, eps: float = 1e-10):
        self.pmin = pmin
        self.pmax = pmax
        self.eps = eps

    def __call__(self, m):
        lo = np.percentile(m, self.pmin)
        hi = np.percentile(m, self.pmax)
        return (m - lo) / np.clip(hi - lo, self.eps, None)


class Normalize(Transform):
    """min-max to [-1, 1] or [0, 1] (transforms.py Normalize)."""

    def __init__(self, min_value: float | None = None,
                 max_value: float | None = None, norm01: bool = False,
                 eps: float = 1e-10):
        self.min_value = min_value
        self.max_value = max_value
        self.norm01 = norm01
        self.eps = eps

    def __call__(self, m):
        lo = self.min_value if self.min_value is not None else m.min()
        hi = self.max_value if self.max_value is not None else m.max()
        scaled = (m - lo) / np.clip(hi - lo, self.eps, None)
        return scaled if self.norm01 else 2 * scaled - 1


class AdditiveGaussianNoise(Transform):
    def __init__(self, rng: np.random.Generator, scale=(0.0, 1.0),
                 execution_probability: float = 0.1):
        self.rng = rng
        self.scale = scale
        self.p = execution_probability

    def __call__(self, m):
        if self.rng.random() < self.p:
            std = self.rng.uniform(self.scale[0], self.scale[1])
            return m + self.rng.normal(0, std, m.shape).astype(m.dtype)
        return m


class AdditivePoissonNoise(Transform):
    def __init__(self, rng: np.random.Generator, lam=(0.0, 1.0),
                 execution_probability: float = 0.1):
        self.rng = rng
        self.lam = lam
        self.p = execution_probability

    def __call__(self, m):
        if self.rng.random() < self.p:
            lam = self.rng.uniform(self.lam[0], self.lam[1])
            return m + self.rng.poisson(lam, m.shape).astype(m.dtype)
        return m


class ToTensor(Transform):
    """float32 + ensure trailing channel dim (transforms.py ToTensor,
    adapted to channels-last)."""

    def __init__(self, expand_dims: bool = True, dtype=np.float32):
        self.expand_dims = expand_dims
        self.dtype = dtype

    def __call__(self, m):
        m = np.asarray(m, self.dtype)
        if self.expand_dims and m.ndim == 3:
            m = m[..., None]
        return m


class StandardLabelToBoundary(Transform):
    """Label map -> boundary mask via erosion difference
    (transforms.py:250+ family, simplified: 6-connectivity)."""

    def __init__(self, append_label: bool = False):
        self.append_label = append_label

    def __call__(self, m):
        from scipy.ndimage import binary_erosion
        lab = np.asarray(m)
        squeeze = lab.ndim == 4
        if squeeze:
            lab = lab[..., 0]
        boundary = np.zeros_like(lab, bool)
        for v in np.unique(lab):
            if v == 0:
                continue
            mask = lab == v
            boundary |= mask & ~binary_erosion(mask)
        out = boundary.astype(np.float32)
        if self.append_label:
            return np.stack([out, lab.astype(np.float32)], axis=-1)
        return out[..., None] if squeeze else out


_TRANSFORMS = {
    "RandomFlip": RandomFlip,
    "RandomRotate90": RandomRotate90,
    "RandomRotate": RandomRotate,
    "RandomContrast": RandomContrast,
    "ElasticDeformation": ElasticDeformation,
    "CropToFixed": CropToFixed,
    "Standardize": Standardize,
    "PercentileNormalizer": PercentileNormalizer,
    "Normalize": Normalize,
    "AdditiveGaussianNoise": AdditiveGaussianNoise,
    "AdditivePoissonNoise": AdditivePoissonNoise,
    "ToTensor": ToTensor,
    "StandardLabelToBoundary": StandardLabelToBoundary,
}
_NEEDS_RNG = {"RandomFlip", "RandomRotate90", "RandomRotate",
              "RandomContrast", "ElasticDeformation", "CropToFixed",
              "AdditiveGaussianNoise", "AdditivePoissonNoise"}


def build_transforms(spec: Sequence[dict], seed: int = 47) -> Compose:
    """Config-driven pipeline factory (transforms.py:692-726):
    [{'name': 'RandomFlip'}, {'name': 'ToTensor', ...}, ...]."""
    rng = np.random.default_rng(seed)
    out = []
    for item in spec:
        item = dict(item)
        name = item.pop("name")
        if name not in _TRANSFORMS:
            raise ValueError(f"unknown transform {name!r}")
        cls = _TRANSFORMS[name]
        if name in _NEEDS_RNG:
            out.append(cls(rng, **item))
        else:
            out.append(cls(**item))
    return Compose(out)
