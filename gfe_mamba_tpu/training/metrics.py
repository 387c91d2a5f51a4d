"""Binary classification metrics in pure JAX.

TPU-native replacement for torchmetrics Recall/F1Score/Accuracy/
Precision/MatthewsCorrCoef (classify_mamba.py:15,119-151;
test_mamba.py:15,69-105).  Computed from streaming confusion counts so
evaluation over many batches is a single jitted reduction + one final
host-side combine; semantics follow torchmetrics binary tasks with the
default 0.5 threshold.

Note: the reference calls ``metric.update(predictions, targets)`` with
the arguments swapped (predictions <- labels, targets <- preds;
classify_mamba.py:142-148 -- SURVEY.md 3.3 quirk).  We implement the
*intended* order: ``binary_metrics(preds, targets)``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class ConfusionCounts(NamedTuple):
    tp: Array
    fp: Array
    tn: Array
    fn: Array

    def __add__(self, other: "ConfusionCounts") -> "ConfusionCounts":
        return ConfusionCounts(*(a + b for a, b in zip(self, other)))


class BinaryMetrics(NamedTuple):
    accuracy: Array
    precision: Array
    recall: Array
    f1: Array
    mcc: Array


def confusion_counts(preds: Array, targets: Array,
                     threshold: float = 0.5) -> ConfusionCounts:
    """preds: probabilities or hard {0,1}; targets: {0,1}."""
    p = (preds >= threshold).astype(jnp.float32).reshape(-1)
    t = (targets >= 0.5).astype(jnp.float32).reshape(-1)
    return ConfusionCounts(
        tp=jnp.sum(p * t),
        fp=jnp.sum(p * (1 - t)),
        tn=jnp.sum((1 - p) * (1 - t)),
        fn=jnp.sum((1 - p) * t),
    )


def _safe_div(num, den):
    return jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)


def metrics_from_counts(c: ConfusionCounts) -> BinaryMetrics:
    precision = _safe_div(c.tp, c.tp + c.fp)
    recall = _safe_div(c.tp, c.tp + c.fn)
    accuracy = _safe_div(c.tp + c.tn, c.tp + c.tn + c.fp + c.fn)
    f1 = _safe_div(2 * precision * recall, precision + recall)
    mcc_num = c.tp * c.tn - c.fp * c.fn
    mcc_den = jnp.sqrt((c.tp + c.fp) * (c.tp + c.fn)
                       * (c.tn + c.fp) * (c.tn + c.fn))
    mcc = _safe_div(mcc_num, mcc_den)
    return BinaryMetrics(accuracy=accuracy, precision=precision,
                         recall=recall, f1=f1, mcc=mcc)


def binary_metrics(preds: Array, targets: Array,
                   threshold: float = 0.5) -> BinaryMetrics:
    return metrics_from_counts(confusion_counts(preds, targets, threshold))
