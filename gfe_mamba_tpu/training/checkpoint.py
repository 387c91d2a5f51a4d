"""Checkpointing: orbax-backed state save/restore with best tracking.

Covers the reference's three checkpoint flavors (SURVEY.md 5.4):
(a) Stage-1 periodic weights (main_gan_vit.py:131-134), (b) Stage-2
best-by-accuracy (tie-broken by val loss) + current (classify_mamba.py:
155-173), (c) full train-state resume including optimizer state and
step (the vendored trainer's capability, unet3d/utils.py:34-68 --
the GFE entry points themselves only saved weights; we save full state
so resume is lossless).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.PyTreeCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, name: str, tree: Any) -> None:
        self._ckpt.save(self._path(name), tree, force=True)

    def restore(self, name: str, like: Any | None = None) -> Any:
        if like is not None:
            return self._ckpt.restore(self._path(name), item=like)
        return self._ckpt.restore(self._path(name))

    def exists(self, name: str) -> bool:
        return os.path.exists(self._path(name))


class BestTracker:
    """Best-by-accuracy, ties broken by lower validation loss
    (classify_mamba.py:155-160)."""

    def __init__(self):
        self.best_accuracy = 0.0
        self.best_loss = float("inf")

    def is_better(self, accuracy: float, loss: float) -> bool:
        if accuracy > self.best_accuracy or (
                accuracy == self.best_accuracy and loss < self.best_loss):
            self.best_accuracy = accuracy
            self.best_loss = loss
            return True
        return False


def save_params_npz(path: str, params: Any) -> None:
    """Light-weight single-file weights dump (role of torch.save
    state_dict, main_gan_vit.py:131-134) -- flat {path: array} npz."""
    flat = {}
    for keypath, leaf in jax.tree_util.tree_leaves_with_path(params):
        key = "/".join(str(getattr(k, "key", k)) for k in keypath)
        flat[key] = np.asarray(leaf)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def load_params_npz(path: str, like: Any) -> Any:
    """Restore a pytree saved by save_params_npz into ``like``'s
    structure."""
    loaded = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for keypath, leaf in flat:
        key = "/".join(str(getattr(k, "key", k)) for k in keypath)
        if key not in loaded:
            raise KeyError(f"checkpoint missing {key}")
        arr = loaded[key]
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(
                f"shape mismatch for {key}: ckpt {arr.shape} vs "
                f"model {np.shape(leaf)}")
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(
        treedef, [l for _, l in zip(flat, leaves)])
