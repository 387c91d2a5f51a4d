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


class AsyncCheckpointManager:
    """Step-indexed async checkpointing with retention.

    The production upgrade over :class:`Checkpointer`: saves run in a
    background thread (training does not block on serialization --
    orbax AsyncCheckpointer), old steps are garbage-collected down to
    ``max_to_keep``, and ``keep_best`` additionally retains the k
    highest-``metric`` steps (best-k retention).  ``wait()`` (or
    ``close()``) drains pending writes; call before reading a ckpt back
    or exiting.

    Replaces the reference's blocking torch.save flavors
    (main_gan_vit.py:131-134, classify_mamba.py:155-173) with
    non-blocking saves suitable for large sharded states.
    """

    def __init__(self, directory: str, *, max_to_keep: int = 3,
                 keep_best: int = 0):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._async = ocp.AsyncCheckpointer(
            ocp.PyTreeCheckpointHandler())
        self.max_to_keep = max_to_keep
        self.keep_best = keep_best
        self._metrics: dict[int, float] = {}
        self._load_index()

    # -- index persistence (metrics survive restarts) ------------------
    def _index_path(self) -> str:
        return os.path.join(self.directory, "index.json")

    def _load_index(self) -> None:
        import json
        if os.path.exists(self._index_path()):
            with open(self._index_path()) as f:
                self._metrics = {int(k): v for k, v in json.load(f).items()}

    def _save_index(self) -> None:
        import json
        with open(self._index_path(), "w") as f:
            json.dump({str(k): v for k, v in self._metrics.items()}, f)

    def _step_path(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:08d}")

    def steps(self) -> list[int]:
        out = []
        for name in os.listdir(self.directory):
            # skip orbax in-flight tmp dirs (step_XXXX.orbax-...-tmp)
            if name.startswith("step_") and name[5:].isdigit() \
                    and os.path.isdir(os.path.join(self.directory, name)):
                out.append(int(name[5:]))
        return sorted(out)

    def save(self, step: int, tree: Any, *, metric: float | None = None
             ) -> None:
        """Async save; ``metric`` (higher = better) feeds best-k
        retention."""
        self._async.save(self._step_path(step), tree, force=True)
        if metric is not None:
            self._metrics[step] = float(metric)
        # multi-process runs call save() collectively (orbax coordinates
        # the write); index/GC filesystem mutation happens once
        if jax.process_index() == 0:
            if metric is not None:
                self._save_index()
            self._gc()

    def _retained(self) -> set:
        steps = self.steps()
        keep = set(steps[-self.max_to_keep:]) if self.max_to_keep else set()
        if self.keep_best and self._metrics:
            ranked = sorted(self._metrics, key=self._metrics.get,
                            reverse=True)
            keep |= set(ranked[:self.keep_best])
        return keep

    def _gc(self) -> None:
        # deleting OTHER steps' committed dirs cannot race the in-flight
        # step's write (steps() skips orbax tmp dirs), so no wait() here
        # -- waiting would drain the just-launched async save and make
        # every steady-state save blocking
        import shutil
        keep = self._retained()
        for step in self.steps():
            if step not in keep:
                shutil.rmtree(self._step_path(step), ignore_errors=True)
                self._metrics.pop(step, None)
        self._save_index()

    def best_step(self) -> int | None:
        if not self._metrics:
            return None
        return max(self._metrics, key=self._metrics.get)

    def latest_step(self) -> int | None:
        steps = self.steps()
        return steps[-1] if steps else None

    def restore(self, step: int, like: Any | None = None) -> Any:
        self.wait()
        ckpt = ocp.PyTreeCheckpointer()
        if like is not None:
            return ckpt.restore(self._step_path(step), item=like)
        return ckpt.restore(self._step_path(step))

    def wait(self) -> None:
        self._async.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._async.close()


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
