"""Sliding-window volumetric prediction with overlap normalization.

Reference: pytorch3dunet/unet3d/predictor.py:57-169 (StandardPredictor):
iterate the patch grid, mirror-pad a halo around each patch, run the
model, strip the halo, accumulate predictions and per-voxel counts,
divide at the end.  TPU-native twist: patches are batched and run
through one jitted forward, so the MXU sees a full batch of
equally-shaped patches instead of one at a time.

Variants (same reference file):
- ``sliding_window_predict_lazy`` — LazyPredictor (predictor.py:191-230):
  the prediction/normalization maps live in the output HDF5 file, never
  in RAM; normalization runs in 1/27-volume chunks at the end.
- ``dsb_predict`` — DSB2018Predictor (predictor.py:233-290): per-image
  forward, probability maps thresholded + connected-component labeled
  into an instance segmentation, one ``*_predictions.h5`` per input.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, Sequence

import numpy as np

from gfe_mamba_tpu.segmentation.slicers import SliceBuilder


def _mirror_pad(volume: np.ndarray, halo) -> np.ndarray:
    pad = [(h, h) for h in halo]
    if volume.ndim == 4:
        pad.append((0, 0))
    return np.pad(volume, pad, mode="reflect")


def _iter_patch_predictions(predict_fn, volume, patch_shape, stride_shape,
                            halo, batch_size):
    """Yield (slice_tuple, halo-stripped prediction) over the patch
    grid, running ``predict_fn`` on batches of halo-padded patches."""
    spatial = volume.shape[:3]
    padded = _mirror_pad(volume, halo)
    slices = SliceBuilder(spatial, patch_shape, stride_shape).raw_slices
    for start in range(0, len(slices), batch_size):
        chunk = slices[start:start + batch_size]
        patches = []
        for sl in chunk:
            padded_sl = tuple(
                slice(s.start, s.stop + 2 * h) for s, h in zip(sl, halo))
            patches.append(padded[padded_sl])
        out = np.asarray(predict_fn(np.stack(patches)))
        for sl, pred in zip(chunk, out):
            if any(halo):
                pred = pred[tuple(
                    slice(h, pred.shape[i] - h) if h else slice(None)
                    for i, h in enumerate(halo))]
            yield sl, pred


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
    prediction = np.zeros(spatial + (out_channels,), np.float32)
    counts = np.zeros(spatial + (1,), np.float32)
    for sl, pred in _iter_patch_predictions(
            predict_fn, volume, patch_shape, stride_shape,
            tuple(halo_shape), batch_size):
        prediction[sl] += pred
        counts[sl] += 1.0
    return prediction / np.clip(counts, 1.0, None)


def sliding_window_predict_lazy(
    predict_fn: Callable[[np.ndarray], np.ndarray],
    volume: np.ndarray,
    patch_shape,
    stride_shape,
    out_path: str,
    *,
    halo_shape=(0, 0, 0),
    out_channels: int = 1,
    batch_size: int = 4,
    dataset_name: str = "predictions",
) -> str:
    """LazyPredictor twin (predictor.py:191-230): accumulate the
    prediction and visit-count maps directly in ``out_path`` (gzip,
    chunked) so volumes that don't fit in RAM still assemble; then
    normalize in 1/27-volume chunks, resetting each visited count
    chunk to 1 so overlapping normalization slices never divide twice,
    and drop the normalization dataset."""
    import h5py

    volume = np.asarray(volume)
    if volume.ndim == 3:
        volume = volume[..., None]
    spatial = volume.shape[:3]
    with h5py.File(out_path, "w") as f:
        prediction = f.create_dataset(
            dataset_name, shape=spatial + (out_channels,), dtype="float32",
            chunks=True, compression="gzip")
        counts = f.create_dataset(
            "normalization", shape=spatial, dtype="uint8",
            chunks=True, compression="gzip")
        for sl, pred in _iter_patch_predictions(
                predict_fn, volume, patch_shape, stride_shape,
                tuple(halo_shape), batch_size):
            prediction[sl] = prediction[sl] + pred
            counts[sl] = counts[sl] + 1
        # normalize chunk-wise (1/27 of the volume at a time)
        chunk_shape = tuple(max(1, s // 3) for s in spatial)
        for sl in SliceBuilder(spatial, chunk_shape, chunk_shape).raw_slices:
            c = counts[sl].astype(np.float32)[..., None]
            prediction[sl] = prediction[sl] / np.clip(c, 1.0, None)
            counts[sl] = 1
        del f["normalization"]
    return out_path


def pmaps_to_segmentation(pred: np.ndarray, threshold: float = 0.5
                          ) -> np.ndarray:
    """Threshold probability maps and connected-component label them
    (predictor.py:275-277 ``_pmaps_to_seg``; full connectivity like
    skimage.measure.label's default, via scipy.ndimage)."""
    from scipy.ndimage import label

    mask = np.asarray(pred) > threshold
    structure = np.ones((3,) * mask.ndim, dtype=bool)
    lab, _ = label(mask, structure=structure)
    return lab.astype("uint16")


def dsb_predict(
    predict_fn: Callable[[np.ndarray], np.ndarray],
    items: Iterable[tuple[np.ndarray, str]],
    output_dir: str | None = None,
    *,
    save_segmentation: bool = True,
    threshold: float = 0.5,
) -> list[str]:
    """DSB2018Predictor twin (predictor.py:233-290): per-image forward,
    write ``predictions`` (+ thresholded/labeled ``segmentation``) to
    ``<stem>_predictions.h5`` next to the input (or in output_dir).

    items: iterable of (image, source_path); image is (X, Y[, C]) or a
    batch (B, X, Y[, C]) paired with a list of paths.
    """
    import h5py

    written = []
    for img, path in items:
        img = np.asarray(img)
        paths = [path] if isinstance(path, (str, os.PathLike)) else list(path)
        batch = img if len(paths) > 1 or img.ndim == 4 else img[None]
        preds = np.asarray(predict_fn(batch))
        if len(preds) != len(paths):
            raise ValueError(
                f"dsb_predict: {len(preds)} predictions for "
                f"{len(paths)} output path(s) -- a batched image must "
                f"be paired with a list of one path per batch item")
        for single_pred, single_path in zip(preds, paths):
            single_pred = np.squeeze(single_pred)
            out_file = os.path.splitext(single_path)[0] + "_predictions.h5"
            if output_dir is not None:
                out_file = os.path.join(output_dir,
                                        os.path.basename(out_file))
            with h5py.File(out_file, "w") as f:
                f.create_dataset("predictions", data=single_pred,
                                 compression="gzip")
                if save_segmentation:
                    f.create_dataset(
                        "segmentation",
                        data=pmaps_to_segmentation(single_pred, threshold),
                        compression="gzip")
            written.append(out_file)
    return written
