"""HDF5 patch datasets (reference pytorch3dunet/datasets/hdf5.py:14-232).

``HDF5Dataset`` iterates SliceBuilder patches over ``raw``/``label``
(+ optional ``weight``) datasets inside one or more .h5 files, applying
config-driven augmentation pipelines.  ``standard`` mode preloads into
memory (StandardHDF5Dataset); ``lazy`` keeps file handles open and reads
patches on demand (LazyHDF5Dataset).  Layout: the reference stores
(C, X, Y, Z) or (X, Y, Z); channels are moved LAST here.

``get_train_loaders``-style construction happens in
gfe_mamba_tpu.segmentation.trainer from the config dict.
"""

from __future__ import annotations

import glob
import os
from typing import Sequence

import numpy as np

from gfe_mamba_tpu.segmentation.slicers import FilterSliceBuilder, SliceBuilder
from gfe_mamba_tpu.segmentation.transforms import build_transforms


def _to_channels_last(arr: np.ndarray) -> np.ndarray:
    if arr.ndim == 4:  # (C, X, Y, Z) -> (X, Y, Z, C)
        return np.moveaxis(arr, 0, -1)
    return arr


def traverse_h5_paths(file_paths: Sequence[str]) -> list[str]:
    """Expand directories to the .h5 files inside (hdf5.py helper)."""
    results = []
    for path in file_paths:
        if os.path.isdir(path):
            for ext in ("*.h5", "*.hdf", "*.hdf5", "*.hd5"):
                results.extend(sorted(glob.glob(os.path.join(path, ext))))
        else:
            results.append(path)
    return results


class HDF5Dataset:
    def __init__(self, file_path: str, phase: str, slice_builder_config: dict,
                 transformer_config: Sequence[dict] | None = None,
                 raw_internal_path: str = "raw",
                 label_internal_path: str = "label",
                 weight_internal_path: str | None = None,
                 lazy: bool = False, seed: int = 47):
        import h5py

        assert phase in ("train", "val", "test")
        self.phase = phase
        self.lazy = lazy
        self.file_path = file_path
        self.raw_path = raw_internal_path
        self.label_path = label_internal_path
        self.weight_path = weight_internal_path

        with h5py.File(file_path, "r") as f:
            raw = _to_channels_last(f[raw_internal_path][...])
            label = None
            if phase != "test" and label_internal_path in f:
                label = _to_channels_last(f[label_internal_path][...])
        if not lazy:
            self._raw, self._label = raw, label
        else:
            self._raw = self._label = None

        sb_config = dict(slice_builder_config)
        name = sb_config.pop("name", "SliceBuilder")
        patch = sb_config.pop("patch_shape")
        stride = sb_config.pop("stride_shape")
        if name == "FilterSliceBuilder" and label is not None:
            self.slices = FilterSliceBuilder(raw.shape, patch, stride,
                                             label=label, **sb_config)
        else:
            self.slices = SliceBuilder(raw.shape, patch, stride)

        self.transform = (build_transforms(transformer_config, seed)
                          if transformer_config else None)
        self.label_transform = None  # label pipelines attach via config

    def _read(self, internal_path: str, sl):
        if not self.lazy:
            src = self._raw if internal_path == self.raw_path else self._label
            return src[sl]
        import h5py
        with h5py.File(self.file_path, "r") as f:
            arr = f[internal_path]
            if arr.ndim == 4:  # (C, X, Y, Z)
                return np.moveaxis(arr[(slice(None),) + sl], 0, -1)
            return arr[sl]

    def __len__(self) -> int:
        return len(self.slices)

    def __getitem__(self, index: int) -> dict:
        sl = self.slices[index]
        raw = np.asarray(self._read(self.raw_path, sl), np.float32)
        if raw.ndim == 3:
            raw = raw[..., None]
        if self.transform is not None:
            raw = self.transform(raw)
        item = {"raw": raw, "slice_index": np.int32(index)}
        if self.phase != "test" and (self._label is not None or self.lazy):
            label = np.asarray(self._read(self.label_path, sl), np.float32)
            if label.ndim == 3:
                label = label[..., None]
            item["label"] = label
        return item


def save_predictions_h5(path: str, prediction: np.ndarray,
                        dataset_name: str = "predictions") -> None:
    """Gzip HDF5 output (predictor.py:150-168)."""
    import h5py
    with h5py.File(path, "w") as f:
        f.create_dataset(dataset_name, data=np.moveaxis(prediction, -1, 0),
                         compression="gzip")
