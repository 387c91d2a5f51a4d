"""Segmentation evaluation metrics (reference unet3d/metrics.py:430
factory + seg_metrics.py IoU-matrix scores).

``get_evaluation_metric(config)`` over: DiceCoefficient, MeanIoU, PSNR,
MSE, plus the IoU-matrix-based instance scores (precision / recall /
F1 / accuracy / average-precision at an IoU threshold,
seg_metrics.py:5-123).  Boundary/instance metrics needing connected
components (AdaptedRandError family) run on host numpy.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def dice_coefficient(pred: Array, target: Array, epsilon: float = 1e-6) -> Array:
    """Soft Dice averaged over channels (metrics.py DiceCoefficient)."""
    from gfe_mamba_tpu.segmentation.losses import compute_per_channel_dice
    return jnp.mean(compute_per_channel_dice(pred, target, epsilon=epsilon))


def mean_iou(pred: Array, target: Array, threshold: float = 0.5) -> Array:
    """Binarized per-channel IoU, averaged (metrics.py MeanIoU)."""
    p = pred > threshold
    t = target > 0.5
    axes = tuple(range(pred.ndim - 1))
    inter = jnp.sum((p & t).astype(jnp.float32), axis=axes)
    union = jnp.sum((p | t).astype(jnp.float32), axis=axes)
    return jnp.mean(jnp.where(union > 0, inter / jnp.clip(union, 1.0, None),
                              1.0))


def psnr(pred: Array, target: Array) -> Array:
    mse = jnp.mean((pred - target) ** 2)
    rng = jnp.max(target) - jnp.min(target)
    return 20 * jnp.log10(jnp.clip(rng, 1e-12, None)) - 10 * jnp.log10(
        jnp.clip(mse, 1e-12, None))


def mse_metric(pred: Array, target: Array) -> Array:
    return jnp.mean((pred - target) ** 2)


# ---------------------------------------------------------------------------
# instance-level scores via the IoU matrix (seg_metrics.py)

def _label_components(mask: np.ndarray) -> np.ndarray:
    from scipy.ndimage import label
    labeled, _ = label(mask)
    return labeled


def iou_matrix(pred_labels: np.ndarray, gt_labels: np.ndarray) -> np.ndarray:
    """(n_pred, n_gt) IoU matrix between instance label maps
    (seg_metrics.py:5-40)."""
    n_pred = int(pred_labels.max())
    n_gt = int(gt_labels.max())
    matrix = np.zeros((n_pred, n_gt), np.float64)
    for i in range(1, n_pred + 1):
        p = pred_labels == i
        p_sum = p.sum()
        touching = np.unique(gt_labels[p])
        for j in touching:
            if j == 0:
                continue
            g = gt_labels == j
            inter = np.logical_and(p, g).sum()
            union = p_sum + g.sum() - inter
            matrix[i - 1, j - 1] = inter / union if union else 0.0
    return matrix


def instance_scores(pred_mask: np.ndarray, gt_mask: np.ndarray,
                    iou_threshold: float = 0.5) -> dict:
    """Instance precision/recall/F1/accuracy/AP at an IoU threshold
    (seg_metrics.py:43-123)."""
    pred_labels = _label_components(np.asarray(pred_mask) > 0)
    gt_labels = _label_components(np.asarray(gt_mask) > 0)
    matrix = iou_matrix(pred_labels, gt_labels)
    n_pred, n_gt = matrix.shape
    if n_gt == 0 and n_pred == 0:
        return {"precision": 1.0, "recall": 1.0, "f1": 1.0,
                "accuracy": 1.0, "ap": 1.0}
    matched = matrix >= iou_threshold
    tp = int(np.count_nonzero(matched.any(axis=1)))
    fp = n_pred - tp
    fn = n_gt - int(np.count_nonzero(matched.any(axis=0)))
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    accuracy = tp / (tp + fp + fn) if tp + fp + fn else 0.0
    return {"precision": precision, "recall": recall, "f1": f1,
            "accuracy": accuracy, "ap": accuracy}


_METRICS: dict[str, Callable] = {
    "DiceCoefficient": dice_coefficient,
    "MeanIoU": mean_iou,
    "PSNR": psnr,
    "MSE": mse_metric,
}


def get_evaluation_metric(config: dict) -> Callable:
    """metrics.py:430 factory: config['eval_metric'] = {'name', ...}."""
    metric_config = dict(config["eval_metric"])
    name = metric_config.pop("name")
    if name in _METRICS:
        fn = _METRICS[name]
        return partial(fn, **metric_config) if metric_config else fn
    if name in ("AveragePrecision", "InstanceScores"):
        return partial(instance_scores, **metric_config)
    raise ValueError(
        f"Unsupported metric {name!r}; available: "
        f"{sorted(_METRICS) + ['AveragePrecision', 'InstanceScores']}")
