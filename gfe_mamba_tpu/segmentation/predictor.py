"""Sliding-window volumetric prediction with overlap normalization.

Reference: pytorch3dunet/unet3d/predictor.py:57-169 (StandardPredictor):
iterate the patch grid, mirror-pad a halo around each patch, run the
model, strip the halo, accumulate predictions and per-voxel counts,
divide at the end.  TPU-native twist: patches are batched and run
through one jitted forward, so the MXU sees a full batch of
equally-shaped patches instead of one at a time.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from gfe_mamba_tpu.segmentation.slicers import SliceBuilder


def _mirror_pad(volume: np.ndarray, halo) -> np.ndarray:
    pad = [(h, h) for h in halo]
    if volume.ndim == 4:
        pad.append((0, 0))
    return np.pad(volume, pad, mode="reflect")


def sliding_window_predict(
    predict_fn: Callable[[np.ndarray], np.ndarray],
    volume: np.ndarray,
    patch_shape,
    stride_shape,
    *,
    halo_shape=(0, 0, 0),
    out_channels: int = 1,
    batch_size: int = 4,
) -> np.ndarray:
    """Predict a full (X, Y, Z[, C]) volume patch-wise.

    predict_fn: batched jitted forward (B, px, py, pz, C) ->
    (B, px, py, pz, out_channels) (patches arrive halo-padded and the
    result is halo-stripped here, predictor.py:174-188 semantics).
    """
    volume = np.asarray(volume)
    if volume.ndim == 3:
        volume = volume[..., None]
    spatial = volume.shape[:3]
    halo = tuple(halo_shape)
    padded = _mirror_pad(volume, halo)

    builder = SliceBuilder(spatial, patch_shape, stride_shape)
    prediction = np.zeros(spatial + (out_channels,), np.float32)
    counts = np.zeros(spatial + (1,), np.float32)

    slices = builder.raw_slices
    for start in range(0, len(slices), batch_size):
        chunk = slices[start:start + batch_size]
        patches = []
        for sl in chunk:
            padded_sl = tuple(
                slice(s.start, s.stop + 2 * h) for s, h in zip(sl, halo))
            patches.append(padded[padded_sl])
        batch = np.stack(patches)
        out = np.asarray(predict_fn(batch))
        for sl, pred in zip(chunk, out):
            if any(halo):
                pred = pred[tuple(
                    slice(h, pred.shape[i] - h) if h else slice(None)
                    for i, h in enumerate(halo))]
            prediction[sl] += pred
            counts[sl] += 1.0
    return prediction / np.clip(counts, 1.0, None)
