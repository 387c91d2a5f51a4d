"""Tracing / profiling hooks (SURVEY.md 5.1: the reference has none --
tqdm postfixes and ad-hoc time.time() only; these are the cheap wins).

* ``trace(logdir)``: context manager around ``jax.profiler`` producing
  TensorBoard-viewable traces of the jitted steps.
* ``StepTimer``: wall-clock per-step timing with EMA + percentiles,
  for steady-state throughput reporting without a profiler.
* ``annotate``: named trace spans (jax.profiler.TraceAnnotation).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulates step wall times; ``summary()`` reports mean/EMA/p50/p95
    and items/sec."""

    def __init__(self, ema: float = 0.9):
        self.ema_coef = ema
        self.ema = None
        self.times: list[float] = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        self.ema = dt if self.ema is None else (
            self.ema_coef * self.ema + (1 - self.ema_coef) * dt)
        return False

    def summary(self, items_per_step: int = 1, skip_warmup: int = 1) -> dict:
        times = np.asarray(self.times[skip_warmup:] or self.times)
        return {
            "steps": len(self.times),
            "mean_s": float(times.mean()),
            "ema_s": float(self.ema) if self.ema is not None else None,
            "p50_s": float(np.percentile(times, 50)),
            "p95_s": float(np.percentile(times, 95)),
            "items_per_sec": float(items_per_step / times.mean()),
        }
