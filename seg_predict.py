#!/usr/bin/env python
"""Standalone segmentation prediction CLI (reference
pytorch3dunet/predict.py:26-57 + unet3d/predictor.py:57-169): batched
sliding-window inference with mirror halo and overlap-normalized
assembly, gzip HDF5 output.

Usage: python seg_predict.py --config <yaml>
"""

from __future__ import annotations

import argparse
import os

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from gfe_mamba_tpu.models.unet3d import get_model
from gfe_mamba_tpu.segmentation.hdf5 import (
    save_predictions_h5, traverse_h5_paths,
)
from gfe_mamba_tpu.segmentation.predictor import sliding_window_predict
from gfe_mamba_tpu.training.checkpoint import Checkpointer
from seg_train import load_nested_config


def main(args):
    config = load_nested_config(args.config, args.override)
    model = get_model(config["model"])

    ckpt = Checkpointer(os.path.dirname(config["model_path"]))
    name = os.path.basename(config["model_path"])

    loaders_cfg = config["loaders"]
    test_cfg = loaders_cfg["test"]
    paths = traverse_h5_paths(test_cfg["file_paths"])
    patch = tuple(test_cfg["slice_builder"]["patch_shape"])
    stride = tuple(test_cfg["slice_builder"]["stride_shape"])
    halo = tuple(test_cfg["slice_builder"].get("halo_shape", (0, 0, 0)))

    params = None
    fwd = None
    for path in paths:
        with h5py.File(path, "r") as f:
            raw = f[loaders_cfg.get("raw_internal_path", "raw")][...]
        if raw.ndim == 4:
            raw = np.moveaxis(raw, 0, -1)
        else:
            raw = raw[..., None]
        if params is None:
            sample = jnp.zeros((1,) + tuple(
                p + 2 * h for p, h in zip(patch, halo)) + (raw.shape[-1],))
            variables = model.init(jax.random.key(0), sample)
            payload = ckpt.restore(name, like={
                "params": variables, "num_iterations": 0,
                "best_eval_score": 0.0})
            params = payload["params"]
            fwd = jax.jit(lambda v, x: model.apply(v, x))
        prediction = sliding_window_predict(
            lambda x: fwd(params, jnp.asarray(x)), raw, patch, stride,
            halo_shape=halo, out_channels=config["model"]["out_channels"],
            batch_size=test_cfg.get("batch_size", 4))
        out_path = os.path.splitext(path)[0] + "_predictions.h5"
        save_predictions_h5(out_path, prediction)
        print(f"{path} -> {out_path} {prediction.shape}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--override", nargs="*", default=[])
    main(parser.parse_args())
