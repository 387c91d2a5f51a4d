"""Segmentation losses (reference pytorch3dunet/unet3d/losses.py).

Factory ``get_loss_criterion(config)`` (losses.py:273-345) over:
DiceLoss, GeneralizedDiceLoss, BCEDiceLoss, BCEWithLogitsLoss,
CrossEntropyLoss, WeightedCrossEntropyLoss, PixelWiseCrossEntropyLoss,
WeightedSmoothL1Loss, MSELoss, SmoothL1Loss, L1Loss -- with the
``ignore_index`` masking and ``skip_last_target`` wrappers
(losses.py:36-80).

Channels-last: inputs (B, *spatial, C); targets are either one-hot
(B, *spatial, C) or integer label maps (B, *spatial) for CE losses.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax

Array = jax.Array


def flatten_per_channel(x: Array) -> Array:
    """(B, *spatial, C) -> (C, B * prod(spatial))."""
    c = x.shape[-1]
    return jnp.moveaxis(x.reshape(-1, c), 0, 1)


def compute_per_channel_dice(pred: Array, target: Array,
                             epsilon: float = 1e-6,
                             weight: Array | None = None) -> Array:
    """Per-channel Dice over the batch (losses.py dice helper)."""
    p = flatten_per_channel(pred)
    t = flatten_per_channel(target).astype(jnp.float32)
    intersect = jnp.sum(p * t, axis=-1)
    if weight is not None:
        intersect = weight * intersect
    denom = jnp.sum(p * p, axis=-1) + jnp.sum(t * t, axis=-1)
    return 2 * intersect / jnp.clip(denom, epsilon, None)


def dice_loss(pred: Array, target: Array, *, normalization: str = "sigmoid",
              weight: Array | None = None) -> Array:
    pred = _normalize(pred, normalization)
    return 1.0 - jnp.mean(compute_per_channel_dice(pred, target,
                                                   weight=weight))


def generalized_dice_loss(pred: Array, target: Array, *,
                          normalization: str = "sigmoid",
                          epsilon: float = 1e-6) -> Array:
    """GDL: class weights = 1 / (sum t)^2 (losses.py GeneralizedDiceLoss)."""
    pred = _normalize(pred, normalization)
    p = flatten_per_channel(pred)
    t = flatten_per_channel(target).astype(jnp.float32)
    if p.shape[0] == 1:
        # binary: treat fg/bg as two classes
        p = jnp.concatenate([p, 1 - p], axis=0)
        t = jnp.concatenate([t, 1 - t], axis=0)
    w = 1.0 / jnp.clip(jnp.sum(t, axis=-1) ** 2, epsilon, None)
    w = jax.lax.stop_gradient(w)
    intersect = jnp.sum(p * t, axis=-1) * w
    denom = (jnp.sum(p, axis=-1) + jnp.sum(t, axis=-1)) * w
    return 1.0 - 2.0 * jnp.sum(intersect) / jnp.clip(jnp.sum(denom),
                                                     epsilon, None)


def _normalize(pred: Array, normalization: str) -> Array:
    if normalization == "sigmoid":
        return jax.nn.sigmoid(pred)
    if normalization == "softmax":
        return jax.nn.softmax(pred, axis=-1)
    return pred


def bce_dice_loss(pred: Array, target: Array, *, alpha: float = 1.0,
                  beta: float = 1.0) -> Array:
    bce = jnp.mean(optax.sigmoid_binary_cross_entropy(
        pred, target.astype(jnp.float32)))
    return alpha * bce + beta * dice_loss(pred, target)


def bce_with_logits(pred: Array, target: Array) -> Array:
    return jnp.mean(optax.sigmoid_binary_cross_entropy(
        pred, target.astype(jnp.float32)))


def cross_entropy_loss(pred: Array, target: Array,
                       weight: Array | None = None,
                       ignore_index: int | None = None) -> Array:
    """pred (B, *s, C) logits; target (B, *s) int labels."""
    logp = jax.nn.log_softmax(pred, axis=-1)
    nll = -jnp.take_along_axis(
        logp, jnp.clip(target, 0, pred.shape[-1] - 1)[..., None],
        axis=-1).squeeze(-1)
    if weight is not None:
        nll = nll * weight[target]
    if ignore_index is not None:
        mask = (target != ignore_index).astype(jnp.float32)
        return jnp.sum(nll * mask) / jnp.clip(jnp.sum(mask), 1.0, None)
    return jnp.mean(nll)


def weighted_cross_entropy_loss(pred: Array, target: Array,
                                ignore_index: int | None = None) -> Array:
    """WCE with inverse-frequency class weights (losses.py
    WeightedCrossEntropyLoss, arXiv:1707.03237)."""
    c = pred.shape[-1]
    flat = target.reshape(-1)
    counts = jnp.zeros(c).at[jnp.clip(flat, 0, c - 1)].add(1.0)
    freq = counts / jnp.clip(jnp.sum(counts), 1.0, None)
    weight = jax.lax.stop_gradient((1.0 - freq) / jnp.clip(freq, 1e-8, None))
    return cross_entropy_loss(pred, target, weight=weight,
                              ignore_index=ignore_index)


def pixel_wise_cross_entropy_loss(pred: Array, target: Array,
                                  pixel_weights: Array) -> Array:
    logp = jax.nn.log_softmax(pred, axis=-1)
    nll = -jnp.take_along_axis(logp, target[..., None], axis=-1).squeeze(-1)
    return jnp.mean(nll * pixel_weights)


def mse_loss(pred: Array, target: Array) -> Array:
    return jnp.mean((pred - target) ** 2)


def l1_loss(pred: Array, target: Array) -> Array:
    return jnp.mean(jnp.abs(pred - target))


def smooth_l1_loss(pred: Array, target: Array, beta: float = 1.0) -> Array:
    diff = jnp.abs(pred - target)
    return jnp.mean(jnp.where(diff < beta, 0.5 * diff ** 2 / beta,
                              diff - 0.5 * beta))


def weighted_smooth_l1_loss(pred: Array, target: Array, *,
                            threshold: float, initial_weight: float,
                            apply_below_threshold: bool = True) -> Array:
    """losses.py WeightedSmoothL1Loss: re-weight region below/above a
    target threshold."""
    diff = jnp.abs(pred - target)
    l = jnp.where(diff < 1.0, 0.5 * diff ** 2, diff - 0.5)
    if apply_below_threshold:
        mask = target < threshold
    else:
        mask = target >= threshold
    l = jnp.where(mask, l * initial_weight, l)
    return jnp.mean(l)


def _skip_last_target(loss_fn):
    """Use all-but-last target channel (losses.py SkipLastTargetChannelWrapper)."""
    def wrapped(pred, target, **kw):
        return loss_fn(pred, target[..., :-1], **kw)
    return wrapped


def _masked(loss_fn, ignore_index: int):
    """Zero out ignore_index regions (losses.py MaskingLossWrapper)."""
    def wrapped(pred, target, **kw):
        mask = (target != ignore_index).astype(pred.dtype)
        return loss_fn(pred * mask, target * mask, **kw)
    return wrapped


_LOSSES: dict[str, Callable] = {
    "DiceLoss": dice_loss,
    "GeneralizedDiceLoss": generalized_dice_loss,
    "BCEDiceLoss": bce_dice_loss,
    "BCEWithLogitsLoss": bce_with_logits,
    "CrossEntropyLoss": cross_entropy_loss,
    "WeightedCrossEntropyLoss": weighted_cross_entropy_loss,
    "PixelWiseCrossEntropyLoss": pixel_wise_cross_entropy_loss,
    "MSELoss": mse_loss,
    "L1Loss": l1_loss,
    "SmoothL1Loss": smooth_l1_loss,
    "WeightedSmoothL1Loss": weighted_smooth_l1_loss,
}


def get_loss_criterion(config: dict) -> Callable:
    """Config-driven factory (losses.py:273-345): config['loss'] holds
    {'name', optional 'ignore_index', 'skip_last_target', 'weight',
    loss-specific kwargs}."""
    loss_config = dict(config["loss"])
    name = loss_config.pop("name")
    ignore_index = loss_config.pop("ignore_index", None)
    skip_last = loss_config.pop("skip_last_target", False)
    loss_config.pop("weight", None)  # tensor weights wired by caller
    if name not in _LOSSES:
        raise ValueError(
            f"Unsupported loss {name!r}; available: {sorted(_LOSSES)}")
    fn = _LOSSES[name]
    if loss_config:
        fn = partial(fn, **loss_config)
    if name in ("CrossEntropyLoss", "WeightedCrossEntropyLoss") and \
            ignore_index is not None:
        fn = partial(fn, ignore_index=ignore_index)
    elif ignore_index is not None:
        fn = _masked(fn, ignore_index)
    if skip_last:
        fn = _skip_last_target(fn)
    return fn
