"""Failure detection + recovery (SURVEY.md 5.3: the reference has NONE
-- crashes lose the epoch and restart is manual).  This module adds the
missing safety net:

* ``finite_guard``: wraps a train step; non-finite loss/update steps
  are DETECTED and the previous state is kept (the bad batch is
  skipped), with a strike counter that aborts after ``max_strikes``
  consecutive bad steps -- a silent-NaN run is worse than a crash.
* ``AutoResume``: periodic full-train-state snapshots + newest-valid
  restore, turning any crash into an at-most-``interval``-steps replay.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from gfe_mamba_tpu.training.checkpoint import Checkpointer


def tree_all_finite(tree: Any) -> jax.Array:
    leaves = [jnp.all(jnp.isfinite(l)) for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)]
    if not leaves:
        return jnp.asarray(True)
    return jnp.stack(leaves).all()


def finite_guard(step_fn: Callable, *, loss_key: str = "cla_loss",
                 max_strikes: int = 10):
    """Wrap ``step_fn(state, *args) -> (new_state, logs)``: if the loss
    or any new parameter is non-finite, keep the OLD state.  The
    selection happens inside jit (lax.cond-free via tree select) so the
    guard adds no host sync; the caller polls ``logs['skipped']``.
    """

    def guarded(state, *args, **kwargs):
        new_state, logs = step_fn(state, *args, **kwargs)
        ok = jnp.logical_and(
            jnp.isfinite(logs[loss_key]), tree_all_finite(new_state))

        def pick(new, old):
            if hasattr(new, "dtype"):
                return jnp.where(ok, new, old)
            return new

        safe_state = jax.tree_util.tree_map(pick, new_state, state)
        logs = dict(logs)
        logs["skipped"] = jnp.logical_not(ok).astype(jnp.float32)
        return safe_state, logs

    return guarded, StrikeCounter(max_strikes)


class StrikeCounter:
    """Aborts after ``max_strikes`` consecutive skipped (non-finite)
    steps -- a silent-NaN run is worse than a crash."""

    def __init__(self, max_strikes: int = 10):
        self.max_strikes = max_strikes
        self.consecutive = 0

    def update(self, skipped: float) -> None:
        if skipped > 0:
            self.consecutive += 1
            if self.consecutive >= self.max_strikes:
                raise FloatingPointError(
                    f"{self.max_strikes} consecutive non-finite train "
                    "steps -- aborting instead of training on garbage")
        else:
            self.consecutive = 0


class AutoResume:
    """Periodic train-state snapshots with newest-first restore
    (capability the reference lacks; the vendored trainer's resume,
    unet3d/utils.py:34-68, only covers its own loop)."""

    def __init__(self, directory: str, interval: int = 500, keep: int = 2):
        self.ckpt = Checkpointer(directory)
        self.interval = interval
        self.keep = keep
        self._slot = 0

    def maybe_save(self, step: int, state: Any, force: bool = False) -> bool:
        """Snapshot every ``interval`` steps; ``force=True`` snapshots
        regardless (epoch boundaries, pre-shutdown)."""
        if not force and (step == 0 or step % self.interval):
            return False
        name = f"auto_{self._slot}"
        self.ckpt.save(name, {"step": step, "state": state})
        self._slot = (self._slot + 1) % self.keep
        return True

    def restore_latest(self, like: Any):
        """Returns (step, state) of the newest snapshot, or (0, None)."""
        best_step, best_state = 0, None
        for slot in range(self.keep):
            name = f"auto_{slot}"
            if not self.ckpt.exists(name):
                continue
            payload = self.ckpt.restore(name,
                                        like={"step": 0, "state": like})
            if int(payload["step"]) >= best_step:
                best_step = int(payload["step"])
                best_state = payload["state"]
        return best_step, best_state
