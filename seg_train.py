#!/usr/bin/env python
"""Standalone segmentation training CLI (reference pytorch3dunet/train.py
:12-31): seeded, config-driven (nested YAML with model/loss/metric/
optimizer/trainer/loaders sections), resumable.

Usage: python seg_train.py --config <yaml>
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from gfe_mamba_tpu.data.loader import DataLoader
from gfe_mamba_tpu.models.unet3d import get_model
from gfe_mamba_tpu.segmentation.hdf5 import HDF5Dataset, traverse_h5_paths
from gfe_mamba_tpu.segmentation.trainer import UNetTrainer


def load_nested_config(path: str, overrides=None) -> dict:
    with open(path) as f:
        config = yaml.safe_load(f)
    for item in overrides or []:
        keys, value = item.split("=", 1)
        node = config
        parts = keys.split(".")
        for key in parts[:-1]:
            node = node.setdefault(key, {})
        node[parts[-1]] = yaml.safe_load(value)
    return config


def build_loaders(config: dict):
    loaders_cfg = config["loaders"]
    datasets = {}
    for phase in ("train", "val"):
        phase_cfg = loaders_cfg[phase]
        paths = traverse_h5_paths(phase_cfg["file_paths"])
        parts = [HDF5Dataset(
            p, phase if phase != "val" else "val",
            phase_cfg["slice_builder"],
            phase_cfg.get("transformer"),
            raw_internal_path=loaders_cfg.get("raw_internal_path", "raw"),
            label_internal_path=loaders_cfg.get("label_internal_path",
                                                "label"),
            lazy=loaders_cfg.get("dataset", "standard") == "lazy",
        ) for p in paths]

        class Concat:
            def __init__(self, parts):
                self.parts = parts
                self.offsets = np.cumsum([0] + [len(p) for p in parts])
            def __len__(self):
                return int(self.offsets[-1])
            def __getitem__(self, i):
                j = int(np.searchsorted(self.offsets, i, "right")) - 1
                return self.parts[j][i - int(self.offsets[j])]

        datasets[phase] = DataLoader(
            Concat(parts), loaders_cfg.get("batch_size", 1),
            shuffle=phase == "train",
            num_workers=loaders_cfg.get("num_workers", 0))
    return datasets["train"], datasets["val"]


def main(args):
    config = load_nested_config(args.config, args.override)
    seed = config.get("manual_seed", 0)
    np.random.seed(seed)

    model = get_model(config["model"])
    trainer = UNetTrainer(model, config,
                          config["trainer"]["checkpoint_dir"])
    train_loader, val_loader = build_loaders(config)

    sample = next(iter(train_loader))
    rng = jax.random.key(seed)
    state = trainer.init_state(rng, jnp.asarray(sample["raw"]))
    if config["trainer"].get("resume"):
        state = trainer.resume(state)
    trainer.fit(state, train_loader, val_loader, rng)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--override", nargs="*", default=[],
                        help="dotted.key=value config overrides")
    main(parser.parse_args())
