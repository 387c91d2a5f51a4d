"""ViT zoo: classifier ViTs (2D/3D), SimpleViT, MAE and DINO wrappers.

Covers the exported surface of the reference's vendored vit_pytorch_diy
(vit_pytorch_diy/__init__.py:1-5 exports ViT, SimpleViT, MAE, Dino) plus
the 3D-capable members used for volumetric work (vit_3d.py:91-126,
simple_vit_3d.py).  The image-to-image bottleneck ViT of the GAN lives
in gfe_mamba_tpu.models.vit; these are the classification /
self-supervised variants.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange
from flax import linen as nn

from gfe_mamba_tpu.models.vit import ViTTransformer

Array = jax.Array


def _pair(v):
    return v if isinstance(v, (tuple, list)) else (v, v)


class ClassifierViT(nn.Module):
    """Standard ViT classifier (vit_pytorch ViT): patchify -> CLS+pos ->
    transformer -> cls/mean pool -> Dense(num_classes)."""

    image_size: int | Sequence[int]
    patch_size: int
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    pool: str = "cls"
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0

    @nn.compact
    def __call__(self, img: Array, *, deterministic: bool = True) -> Array:
        h, w = _pair(self.image_size)
        p1, p2 = _pair(self.patch_size)
        num_patches = (h // p1) * (w // p2)
        x = rearrange(img, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)",
                      p1=p1, p2=p2)
        x = nn.LayerNorm()(x)
        x = nn.Dense(self.dim)(x)
        x = nn.LayerNorm()(x)

        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (1, 1, self.dim))
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, num_patches + 1, self.dim))
        b = x.shape[0]
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.dim)), x], axis=1) + pos
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)
        x = ViTTransformer(self.depth, self.heads, self.dim_head,
                           self.mlp_dim, self.dropout, name="transformer")(
            x, deterministic=deterministic)
        x = x[:, 0] if self.pool == "cls" else jnp.mean(x, axis=1)
        return nn.Dense(self.num_classes, name="mlp_head")(x)


class ViT3D(nn.Module):
    """3D volumetric ViT classifier (vit_3d.py:91-126): cubic patches
    over (B, H, W, D, C) volumes."""

    image_size: Sequence[int]          # (H, W)
    image_depth: int
    patch_size: int
    depth_patch_size: int
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    pool: str = "cls"
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0

    @nn.compact
    def __call__(self, vol: Array, *, deterministic: bool = True) -> Array:
        h, w = _pair(self.image_size)
        p = self.patch_size
        pd = self.depth_patch_size
        num_patches = (h // p) * (w // p) * (self.image_depth // pd)
        x = rearrange(vol, "b (x p1) (y p2) (z pd) c -> b (x y z) (p1 p2 pd c)",
                      p1=p, p2=p, pd=pd)
        x = nn.LayerNorm()(x)
        x = nn.Dense(self.dim)(x)
        x = nn.LayerNorm()(x)
        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (1, 1, self.dim))
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, num_patches + 1, self.dim))
        b = x.shape[0]
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.dim)), x], axis=1) + pos
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)
        x = ViTTransformer(self.depth, self.heads, self.dim_head,
                           self.mlp_dim, self.dropout, name="transformer")(
            x, deterministic=deterministic)
        x = x[:, 0] if self.pool == "cls" else jnp.mean(x, axis=1)
        return nn.Dense(self.num_classes, name="mlp_head")(x)


def _posemb_sincos_2d(h: int, w: int, dim: int,
                      temperature: float = 10000.0) -> Array:
    y, x = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    omega = jnp.arange(dim // 4) / (dim // 4 - 1)
    omega = 1.0 / (temperature ** omega)
    y = y.reshape(-1)[:, None] * omega
    x = x.reshape(-1)[:, None] * omega
    return jnp.concatenate(
        [jnp.sin(x), jnp.cos(x), jnp.sin(y), jnp.cos(y)], axis=1)


class SimpleViT(nn.Module):
    """SimpleViT: sincos pos-emb, mean pool, no CLS/dropout."""

    image_size: int | Sequence[int]
    patch_size: int
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    dim_head: int = 64

    @nn.compact
    def __call__(self, img: Array) -> Array:
        h, w = _pair(self.image_size)
        p1, p2 = _pair(self.patch_size)
        x = rearrange(img, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)",
                      p1=p1, p2=p2)
        x = nn.LayerNorm()(x)
        x = nn.Dense(self.dim)(x)
        x = nn.LayerNorm()(x)
        x = x + _posemb_sincos_2d(h // p1, w // p2, self.dim)
        x = ViTTransformer(self.depth, self.heads, self.dim_head,
                           self.mlp_dim, 0.0, name="transformer")(x)
        return nn.Dense(self.num_classes, name="linear_head")(
            jnp.mean(x, axis=1))


class MAE(nn.Module):
    """Masked autoencoder over a patch grid (mae.py semantics):
    random-mask patches, encode visible ones, decode the full grid with
    mask tokens, L2 reconstruction on masked patches only.

    ``__call__(img, rng)`` returns the scalar reconstruction loss.
    """

    image_size: int | Sequence[int]
    patch_size: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    masking_ratio: float = 0.75
    decoder_dim: int = 128
    decoder_depth: int = 1
    decoder_heads: int = 4
    dim_head: int = 64

    @nn.compact
    def __call__(self, img: Array, rng: Array):
        h, w = _pair(self.image_size)
        p1, p2 = _pair(self.patch_size)
        patches = rearrange(img, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)",
                            p1=p1, p2=p2)
        b, n, patch_dim = patches.shape
        num_masked = int(self.masking_ratio * n)

        tokens = nn.Dense(self.dim, name="patch_embed")(
            nn.LayerNorm(name="patch_norm")(patches))
        pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                         (1, n, self.dim))
        tokens = tokens + pos

        perm = jax.vmap(lambda k: jax.random.permutation(k, n))(
            jax.random.split(rng, b))
        masked_idx, visible_idx = perm[:, :num_masked], perm[:, num_masked:]
        batch_ids = jnp.arange(b)[:, None]
        visible = tokens[batch_ids, visible_idx]

        encoded = ViTTransformer(self.depth, self.heads, self.dim_head,
                                 self.mlp_dim, 0.0, name="encoder")(visible)

        dec_tokens = nn.Dense(self.decoder_dim, name="enc_to_dec")(encoded)
        mask_token = self.param("mask_token", nn.initializers.normal(0.02),
                                (self.decoder_dim,))
        dec_pos = self.param("decoder_pos", nn.initializers.normal(0.02),
                             (1, n, self.decoder_dim))
        full = jnp.zeros((b, n, self.decoder_dim))
        full = full.at[batch_ids, visible_idx].set(dec_tokens)
        full = full.at[batch_ids, masked_idx].set(mask_token)
        full = full + dec_pos
        decoded = ViTTransformer(self.decoder_depth, self.decoder_heads,
                                 self.dim_head, self.decoder_dim * 4, 0.0,
                                 name="decoder")(full)
        pred = nn.Dense(patch_dim, name="to_pixels")(
            decoded[batch_ids, masked_idx])
        target = patches[batch_ids, masked_idx]
        return jnp.mean((pred - target) ** 2)


class DinoHead(nn.Module):
    projection_hidden: int = 256
    projection_out: int = 256

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Dense(self.projection_hidden)(x)
        x = nn.gelu(x)
        x = nn.Dense(self.projection_out)(x)
        return x


def dino_loss(student_logits: Array, teacher_logits: Array,
              student_temp: float = 0.1, teacher_temp: float = 0.04,
              center: Array | None = None) -> Array:
    """Cross-entropy between centered/sharpened teacher and student
    distributions (dino.py semantics)."""
    if center is None:
        center = jnp.zeros(teacher_logits.shape[-1])
    t = jax.nn.softmax((teacher_logits - center) / teacher_temp, axis=-1)
    s = jax.nn.log_softmax(student_logits / student_temp, axis=-1)
    return -jnp.mean(jnp.sum(t * s, axis=-1))


def ema_update(teacher_params, student_params, momentum: float = 0.996):
    """teacher <- m * teacher + (1-m) * student."""
    return jax.tree_util.tree_map(
        lambda t, s: momentum * t + (1.0 - momentum) * s,
        teacher_params, student_params)
