"""Optimizer construction + mixed-precision helpers.

Replaces the reference's torch optimizers and Accelerate AMP
(main_gan_vit.py:45-46, classify_mamba.py:64,106-107):

* Adam(1e-4) generator / Adam(5e-4) discriminator / joint Adam(1e-4)
  classifier, as optax chains
* global-norm clip 1.0 (accelerator.clip_grad_norm_) and the
  classifier loop's PER-TENSOR norm clip (classify_mamba.py:106-107
  clips each parameter individually) as ``clip_by_param_norm``
* bf16 compute policy: parameters stay f32 masters; ``cast_for_compute``
  casts them (and inputs) to bfloat16 inside the loss -- the TPU-native
  replacement for fp16 AMP (config mixed_precision key)
* frozen-subtree masking so the Stage-2 optimizer updates only
  combiner+classifier while the generator stays frozen
  (classify_mamba.py:53,57-64)
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


def clip_by_param_norm(max_norm: float) -> optax.GradientTransformation:
    """Clip EACH parameter tensor to ``max_norm`` independently
    (the reference's per-param torch clip_grad_norm_ loop,
    classify_mamba.py:106-107)."""

    def update_fn(updates, state, params=None):
        del params

        def clip(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g)))
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
            return g * scale

        return jax.tree_util.tree_map(clip, updates), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(),
                                        update_fn)


def adam_with_global_clip(lr: float, clip: float = 1.0) -> optax.GradientTransformation:
    """clip_by_global_norm + Adam (main_gan_vit.py:45,80)."""
    return optax.chain(optax.clip_by_global_norm(clip), optax.adam(lr))


def adam_with_param_clip(lr: float, clip: float = 1.0) -> optax.GradientTransformation:
    """per-tensor clip + Adam (classify_mamba.py:64,106-109)."""
    return optax.chain(clip_by_param_norm(clip), optax.adam(lr))


def masked_trainable(inner: optax.GradientTransformation,
                     frozen_predicate: Callable[[tuple], bool],
                     ) -> optax.GradientTransformation:
    """Freeze subtrees selected by ``frozen_predicate(path)``.

    The label function is evaluated lazily against whatever param tree
    the transformation is ``init``-ed with, so the returned optimizer is
    stateless and reusable across differently-shaped trees."""

    def label(tree):
        def per_path(path, _):
            return "frozen" if frozen_predicate(path) else "train"
        flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
        return jax.tree_util.tree_unflatten(
            treedef, [per_path(p, l) for p, l in flat])

    return optax.multi_transform(
        {"train": inner, "frozen": optax.set_to_zero()}, label)


def cast_for_compute(tree: Any, dtype=jnp.bfloat16) -> Any:
    """Cast float leaves for bf16 compute; integer/other leaves pass."""

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def compute_dtype(mixed_precision: str):
    if mixed_precision in ("bf16", "bfloat16", "fp16", "float16"):
        return jnp.bfloat16  # TPU-native half precision
    return jnp.float32
