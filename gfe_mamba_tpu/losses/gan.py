"""Adversarial losses for PatchGAN training.

Role of MONAI's ``PatchAdversarialLoss`` (main_gan_vit.py:42):
least-squares GAN objective over patch logits, with the same call
contract ``(logits, target_is_real, for_discriminator)`` used by the
Stage-1 loop (main_gan_vit.py:76,89-92).  Also provides bce and hinge
criteria.  Accepts a single logits array or a list (multi-scale
discriminators) which is averaged.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import optax

Array = jax.Array


def _single_loss(logits: Array, target_is_real: bool, for_discriminator: bool,
                 criterion: str) -> Array:
    target = 1.0 if target_is_real else 0.0
    if not for_discriminator and not target_is_real:
        # generator is always trained towards "real"
        target = 1.0
    if criterion == "least_squares":
        return jnp.mean((logits - target) ** 2)
    if criterion == "bce":
        labels = jnp.full_like(logits, target)
        return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, labels))
    if criterion == "hinge":
        if for_discriminator:
            if target_is_real:
                return jnp.mean(jax.nn.relu(1.0 - logits))
            return jnp.mean(jax.nn.relu(1.0 + logits))
        return -jnp.mean(logits)
    raise ValueError(f"unknown criterion {criterion!r}")


def patch_adversarial_loss(logits: Array | Sequence[Array],
                           target_is_real: bool,
                           for_discriminator: bool,
                           criterion: str = "least_squares") -> Array:
    if isinstance(logits, (list, tuple)):
        losses = [
            _single_loss(l, target_is_real, for_discriminator, criterion)
            for l in logits
        ]
        return jnp.mean(jnp.stack(losses))
    return _single_loss(logits, target_is_real, for_discriminator, criterion)
