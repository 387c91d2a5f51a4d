"""ViT zoo, round 3 (batch 2): the simple/1D/token-surgery variants of
the reference's dormant vit_pytorch_diy collection.

Rebuilt TPU-first from the reference modules' *behavior* (channels-last
inputs -- (B, L, C) series, (B, H, W, C) images -- einsum attention,
static token counts so every gather under jit has a fixed shape):

* ``SimpleViT1D`` -- simple_vit_1d.py: 1D patching of a time series,
  fixed 1D sincos position embedding, mean pool.
* ``ViT1D`` -- vit_1d.py: 1D patching with CLS token, learned position
  embedding, CLS head.
* ``SimpleViTPatchDropout`` -- simple_vit_with_patch_dropout.py: keeps
  a random ``1-prob`` subset of patch tokens during training (the
  reference's topk-of-randn subsampling), full set at eval.
* ``ViTPatchDropout`` -- vit_with_patch_dropout.py: same dropout on a
  CLS-style ViT; the position embedding has no CLS row (the CLS token
  carries no position) and mean pooling includes the CLS token --
  both reference quirks kept.
* ``SimpleViTQKNorm`` -- simple_vit_with_qk_norm.py: per-head RMS
  normalization of q and k with a learned gamma initialised to
  ``1/sqrt(dim_head)``; the attention logits carry no extra scale.
* ``SimpleViTRegisterTokens`` -- simple_vit_with_register_tokens.py:
  learned register tokens appended after the position add; only patch
  tokens are mean-pooled.
* ``SimpleViTFFT`` -- simple_vit_with_fft.py: a second token stream
  from the 2D FFT of the image (real/imag stacked), prepended to the
  patch tokens; only the image tokens are pooled.
* ``ViTWithPatchMerger`` -- vit_with_patch_merger.py: learned-query
  attention pooling that merges all tokens down to
  ``patch_merge_num_tokens`` midway through the stack (default layer
  ``depth//2 - 1``); the head is a bare Linear on the mean (no norm),
  and the learned position table keeps its unused extra row.
* ``ViTForSmallDataset`` -- vit_for_small_dataset.py: shifted patch
  tokenization (4 zero-filled axis shifts concatenated on channels)
  and locality self-attention (learned log-temperature, diagonal
  masked out).
* ``ParallelViT`` -- parallel_vit.py: each layer sums N independent
  attention branches, then N independent feed-forward branches
  (two-branch default); patch embedding has no LayerNorms.
* ``LocalViT`` -- local_vit.py: depthwise-conv feed-forward applied on
  the 2D patch grid with the CLS token excluded.  The reference's
  FeedForward applies ``nn.LayerNorm(dim)`` to an NCHW map
  (local_vit.py:45-56), which only runs when width == dim; the norm
  here is over channels (the evident intent), documented deviation.
* ``EfficientViT`` -- efficient.py: the ViT shell with a pluggable
  transformer backbone module.
* ``SimpleFlashAttnViT`` -- simple_flash_attn_vit.py: SimpleViT whose
  attention goes through ``jax.nn.dot_product_attention`` (XLA lowers
  it to the fused TPU attention kernel -- the analogue of the
  reference's torch-2 SDPA path).  The reference's non-flash fallback
  einsum drops the head axis of k/v (simple_flash_attn_vit.py:74,82,
  dead/broken code) and is not reproduced.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from gfe_mamba_tpu.models.vit_zoo import _posemb_sincos_2d

Array = jax.Array


def _pair(t):
    return tuple(t) if isinstance(t, (tuple, list)) else (t, t)


def _posemb_sincos_1d(n: int, dim: int, temperature: float = 10000.0) -> Array:
    """simple_vit_1d.py:9-19 (omega denominator dim//2 - 1)."""
    pos = jnp.arange(n)
    omega = jnp.arange(dim // 2) / (dim // 2 - 1)
    omega = 1.0 / (temperature ** omega)
    ang = pos[:, None] * omega[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=1)


class _Attention(nn.Module):
    """Pre-LN multi-head attention (vit_1d.py:23-55 semantics).

    ``out_bias=False`` gives the simple-vit flavour; ``project_out``
    replicates the heads==1 and dim_head==dim identity shortcut.
    """

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    out_bias: bool = True

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        h = self.heads
        inner = h * self.dim_head
        project_out = not (h == 1 and self.dim_head == self.dim)
        y = nn.LayerNorm(name="norm")(x)
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = rearrange(q, "b n (h d) -> b h n d", h=h) * self.dim_head ** -0.5
        k = rearrange(k, "b n (h d) -> b h n d", h=h)
        v = rearrange(v, "b n (h d) -> b h n d", h=h)
        attn = jax.nn.softmax(jnp.einsum("bhid,bhjd->bhij", q, k), axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = rearrange(jnp.einsum("bhij,bhjd->bhid", attn, v),
                        "b h n d -> b n (h d)")
        if project_out:
            out = nn.Dense(self.dim, use_bias=self.out_bias,
                           name="to_out")(out)
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class _FeedForward(nn.Module):
    """Pre-LN MLP (vit_1d.py:9-21)."""

    dim: int
    hidden_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        y = nn.LayerNorm(name="norm")(x)
        y = nn.gelu(nn.Dense(self.hidden_dim, name="fc1")(y))
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.Dense(self.dim, name="fc2")(y)
        return nn.Dropout(self.dropout)(y, deterministic=deterministic)


def _patch_dropout(x: Array, prob: float, rng: jax.Array) -> Array:
    """simple_vit_with_patch_dropout.py:27-44: keep a random
    ``max(1, int(n*(1-prob)))``-subset of tokens, in topk-of-randn
    order."""
    b, n = x.shape[0], x.shape[1]
    keep = max(1, int(n * (1.0 - prob)))
    scores = jax.random.normal(rng, (b, n))
    idx = jax.lax.top_k(scores, keep)[1]
    return jnp.take_along_axis(x, idx[..., None], axis=1)


# ---------------------------------------------------------------------------
# 1D members
# ---------------------------------------------------------------------------


class SimpleViT1D(nn.Module):
    """simple_vit_1d.py:78-110.  Input (B, L, C) channels-last."""

    seq_len: int
    patch_size: int
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    dim_head: int = 64

    @nn.compact
    def __call__(self, series: Array) -> Array:
        assert self.seq_len % self.patch_size == 0
        x = rearrange(series, "b (n p) c -> b n (p c)", p=self.patch_size)
        x = nn.LayerNorm(name="patch_norm1")(x)
        x = nn.Dense(self.dim, name="patch_proj")(x)
        x = nn.LayerNorm(name="patch_norm2")(x)
        x = x + _posemb_sincos_1d(x.shape[1], self.dim)
        for i in range(self.depth):
            x = x + _Attention(self.dim, self.heads, self.dim_head,
                               out_bias=False, name=f"attn_{i}")(x)
            x = x + _FeedForward(self.dim, self.mlp_dim, name=f"ff_{i}")(x)
        x = nn.LayerNorm(name="final_norm")(x)
        return nn.Dense(self.num_classes, name="linear_head")(
            jnp.mean(x, axis=1))


class ViT1D(nn.Module):
    """vit_1d.py:72-113.  Input (B, L, C) channels-last; CLS head."""

    seq_len: int
    patch_size: int
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0

    @nn.compact
    def __call__(self, series: Array, *, deterministic: bool = True) -> Array:
        assert self.seq_len % self.patch_size == 0
        num_patches = self.seq_len // self.patch_size
        x = rearrange(series, "b (n p) c -> b n (p c)", p=self.patch_size)
        x = nn.LayerNorm(name="patch_norm1")(x)
        x = nn.Dense(self.dim, name="patch_proj")(x)
        x = nn.LayerNorm(name="patch_norm2")(x)
        b, n = x.shape[0], x.shape[1]
        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (self.dim,))
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, num_patches + 1, self.dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.dim)), x], axis=1)
        x = x + pos[:, :n + 1]
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)
        for i in range(self.depth):
            x = x + _Attention(self.dim, self.heads, self.dim_head,
                               self.dropout, name=f"attn_{i}")(
                x, deterministic=deterministic)
            x = x + _FeedForward(self.dim, self.mlp_dim, self.dropout,
                                 name=f"ff_{i}")(x,
                                                 deterministic=deterministic)
        cls_out = nn.LayerNorm(name="head_norm")(x[:, 0])
        return nn.Dense(self.num_classes, name="head")(cls_out)


# ---------------------------------------------------------------------------
# Patch dropout
# ---------------------------------------------------------------------------


class SimpleViTPatchDropout(nn.Module):
    """simple_vit_with_patch_dropout.py:103-141."""

    image_size: Union[int, Sequence[int]]
    patch_size: Union[int, Sequence[int]]
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    dim_head: int = 64
    patch_dropout: float = 0.5

    @nn.compact
    def __call__(self, img: Array, *, deterministic: bool = True) -> Array:
        h, w = _pair(self.image_size)
        p1, p2 = _pair(self.patch_size)
        x = rearrange(img, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)",
                      p1=p1, p2=p2)
        x = nn.LayerNorm(name="patch_norm1")(x)
        x = nn.Dense(self.dim, name="patch_proj")(x)
        x = nn.LayerNorm(name="patch_norm2")(x)
        x = x + _posemb_sincos_2d(h // p1, w // p2, self.dim)
        if not deterministic and self.patch_dropout > 0:
            x = _patch_dropout(x, self.patch_dropout,
                               self.make_rng("dropout"))
        for i in range(self.depth):
            x = x + _Attention(self.dim, self.heads, self.dim_head,
                               out_bias=False, name=f"attn_{i}")(x)
            x = x + _FeedForward(self.dim, self.mlp_dim, name=f"ff_{i}")(x)
        x = nn.LayerNorm(name="final_norm")(x)
        return nn.Dense(self.num_classes, name="linear_head")(
            jnp.mean(x, axis=1))


class ViTPatchDropout(nn.Module):
    """vit_with_patch_dropout.py:96-147.  Reference quirks kept: the
    position table has no CLS row (the CLS token is position-free,
    l.113,133-139) and 'mean' pooling averages CLS + patch tokens."""

    image_size: Union[int, Sequence[int]]
    patch_size: Union[int, Sequence[int]]
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    pool: str = "cls"
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    patch_dropout: float = 0.25

    @nn.compact
    def __call__(self, img: Array, *, deterministic: bool = True) -> Array:
        assert self.pool in ("cls", "mean")
        h, w = _pair(self.image_size)
        p1, p2 = _pair(self.patch_size)
        num_patches = (h // p1) * (w // p2)
        x = rearrange(img, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)",
                      p1=p1, p2=p2)
        x = nn.Dense(self.dim, name="patch_proj")(x)
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (num_patches, self.dim))
        x = x + pos
        if not deterministic and self.patch_dropout > 0:
            x = _patch_dropout(x, self.patch_dropout,
                               self.make_rng("dropout"))
        b = x.shape[0]
        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (1, 1, self.dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.dim)), x], axis=1)
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)
        for i in range(self.depth):
            x = x + _Attention(self.dim, self.heads, self.dim_head,
                               self.dropout, name=f"attn_{i}")(
                x, deterministic=deterministic)
            x = x + _FeedForward(self.dim, self.mlp_dim, self.dropout,
                                 name=f"ff_{i}")(x,
                                                 deterministic=deterministic)
        pooled = jnp.mean(x, axis=1) if self.pool == "mean" else x[:, 0]
        pooled = nn.LayerNorm(name="head_norm")(pooled)
        return nn.Dense(self.num_classes, name="head")(pooled)


# ---------------------------------------------------------------------------
# QK-norm / registers / FFT
# ---------------------------------------------------------------------------


class _QKNormAttention(nn.Module):
    """simple_vit_with_qk_norm.py:29-83: q/k RMS-normalised per head
    with learned gamma (init 1/sqrt(dim_head)); no logit scale."""

    dim: int
    heads: int
    dim_head: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = self.heads
        inner = h * self.dim_head
        scale = self.dim_head ** 0.5
        y = nn.LayerNorm(name="norm")(x)
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = rearrange(q, "b n (h d) -> b h n d", h=h)
        k = rearrange(k, "b n (h d) -> b h n d", h=h)
        v = rearrange(v, "b n (h d) -> b h n d", h=h)

        def rms(t, gamma):
            normed = t / jnp.clip(
                jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
            return normed * scale * gamma

        q_gamma = self.param("q_gamma",
                             lambda _: jnp.full((h, 1, self.dim_head),
                                                1.0 / scale))
        k_gamma = self.param("k_gamma",
                             lambda _: jnp.full((h, 1, self.dim_head),
                                                1.0 / scale))
        attn = jax.nn.softmax(
            jnp.einsum("bhid,bhjd->bhij", rms(q, q_gamma), rms(k, k_gamma)),
            axis=-1)
        out = rearrange(jnp.einsum("bhij,bhjd->bhid", attn, v),
                        "b h n d -> b n (h d)")
        return nn.Dense(self.dim, use_bias=False, name="to_out")(out)


class SimpleViTQKNorm(nn.Module):
    """simple_vit_with_qk_norm.py:99-141."""

    image_size: Union[int, Sequence[int]]
    patch_size: Union[int, Sequence[int]]
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
        x = nn.LayerNorm(name="patch_norm1")(x)
        x = nn.Dense(self.dim, name="patch_proj")(x)
        x = nn.LayerNorm(name="patch_norm2")(x)
        x = x + _posemb_sincos_2d(h // p1, w // p2, self.dim)
        for i in range(self.depth):
            x = x + _QKNormAttention(self.dim, self.heads, self.dim_head,
                                     name=f"attn_{i}")(x)
            x = x + _FeedForward(self.dim, self.mlp_dim, name=f"ff_{i}")(x)
        x = nn.LayerNorm(name="final_norm")(x)
        return nn.Dense(self.num_classes, name="linear_head")(
            jnp.mean(x, axis=1))


class SimpleViTRegisterTokens(nn.Module):
    """simple_vit_with_register_tokens.py (Darcet et al. registers):
    learned tokens appended after the position add; only the patch
    tokens are pooled."""

    image_size: Union[int, Sequence[int]]
    patch_size: Union[int, Sequence[int]]
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    num_register_tokens: int = 4
    dim_head: int = 64

    @nn.compact
    def __call__(self, img: Array) -> Array:
        h, w = _pair(self.image_size)
        p1, p2 = _pair(self.patch_size)
        x = rearrange(img, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)",
                      p1=p1, p2=p2)
        x = nn.LayerNorm(name="patch_norm1")(x)
        x = nn.Dense(self.dim, name="patch_proj")(x)
        x = nn.LayerNorm(name="patch_norm2")(x)
        x = x + _posemb_sincos_2d(h // p1, w // p2, self.dim)
        n = x.shape[1]
        reg = self.param("register_tokens", nn.initializers.normal(1.0),
                         (self.num_register_tokens, self.dim))
        x = jnp.concatenate(
            [x, jnp.broadcast_to(reg, (x.shape[0],) + reg.shape)], axis=1)
        for i in range(self.depth):
            x = x + _Attention(self.dim, self.heads, self.dim_head,
                               out_bias=False, name=f"attn_{i}")(x)
            x = x + _FeedForward(self.dim, self.mlp_dim, name=f"ff_{i}")(x)
        x = nn.LayerNorm(name="final_norm")(x)
        return nn.Dense(self.num_classes, name="linear_head")(
            jnp.mean(x[:, :n], axis=1))


class SimpleViTFFT(nn.Module):
    """simple_vit_with_fft.py:81-146: FFT token stream prepended; only
    the image tokens are pooled."""

    image_size: Union[int, Sequence[int]]
    patch_size: Union[int, Sequence[int]]
    freq_patch_size: Union[int, Sequence[int]]
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
        f1, f2 = _pair(self.freq_patch_size)

        x = rearrange(img, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)",
                      p1=p1, p2=p2)
        x = nn.LayerNorm(name="patch_norm1")(x)
        x = nn.Dense(self.dim, name="patch_proj")(x)
        x = nn.LayerNorm(name="patch_norm2")(x)
        x = x + _posemb_sincos_2d(h // p1, w // p2, self.dim)

        freqs = jnp.fft.fft2(img, axes=(1, 2))
        freqs = jnp.stack([freqs.real, freqs.imag], axis=-1)
        f = rearrange(freqs, "b (h p1) (w p2) c ri -> b (h w) (p1 p2 ri c)",
                      p1=f1, p2=f2)
        f = nn.LayerNorm(name="freq_norm1")(f)
        f = nn.Dense(self.dim, name="freq_proj")(f)
        f = nn.LayerNorm(name="freq_norm2")(f)
        f = f + _posemb_sincos_2d(h // f1, w // f2, self.dim)

        n_freq = f.shape[1]
        tokens = jnp.concatenate([f, x], axis=1)
        for i in range(self.depth):
            tokens = tokens + _Attention(self.dim, self.heads, self.dim_head,
                                         out_bias=False,
                                         name=f"attn_{i}")(tokens)
            tokens = tokens + _FeedForward(self.dim, self.mlp_dim,
                                           name=f"ff_{i}")(tokens)
        tokens = nn.LayerNorm(name="final_norm")(tokens)
        return nn.Dense(self.num_classes, name="linear_head")(
            jnp.mean(tokens[:, n_freq:], axis=1))


# ---------------------------------------------------------------------------
# Patch merger / small-dataset / parallel / local / efficient / flash
# ---------------------------------------------------------------------------


class PatchMerger(nn.Module):
    """vit_with_patch_merger.py:20-31: learned-query attention pooling
    to a fixed number of output tokens."""

    dim: int
    num_tokens_out: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = nn.LayerNorm(name="norm")(x)
        queries = self.param("queries", nn.initializers.normal(1.0),
                             (self.num_tokens_out, self.dim))
        sim = jnp.einsum("qd,bnd->bqn", queries, y) * self.dim ** -0.5
        return jnp.einsum("bqn,bnd->bqd", jax.nn.softmax(sim, axis=-1), y)


class ViTWithPatchMerger(nn.Module):
    """vit_with_patch_merger.py:107-144.  No CLS; merger at layer
    ``patch_merge_layer or depth//2`` (1-based, applied after it); the
    head is a bare Linear over the token mean; the learned position
    table keeps the reference's unused extra row."""

    image_size: Union[int, Sequence[int]]
    patch_size: Union[int, Sequence[int]]
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    patch_merge_layer: Optional[int] = None
    patch_merge_num_tokens: int = 8
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
        x = nn.LayerNorm(name="patch_norm1")(x)
        x = nn.Dense(self.dim, name="patch_proj")(x)
        x = nn.LayerNorm(name="patch_norm2")(x)
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, num_patches + 1, self.dim))
        x = x + pos[:, :x.shape[1]]
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)
        merge_at = (self.patch_merge_layer or self.depth // 2) - 1
        for i in range(self.depth):
            x = x + _Attention(self.dim, self.heads, self.dim_head,
                               self.dropout, name=f"attn_{i}")(
                x, deterministic=deterministic)
            x = x + _FeedForward(self.dim, self.mlp_dim, self.dropout,
                                 name=f"ff_{i}")(x,
                                                 deterministic=deterministic)
            if i == merge_at:
                x = PatchMerger(self.dim, self.patch_merge_num_tokens,
                                name="patch_merger")(x)
        x = nn.LayerNorm(name="final_norm")(x)
        return nn.Dense(self.num_classes, name="head")(jnp.mean(x, axis=1))


class _SPT(nn.Module):
    """vit_for_small_dataset.py:81-96: shifted patch tokenization --
    the image plus four single-pixel zero-filled axis shifts,
    concatenated on channels before patching."""

    dim: int
    patch_size: int

    @nn.compact
    def __call__(self, img: Array) -> Array:
        zc = jnp.zeros_like(img[:, :, :1])
        zr = jnp.zeros_like(img[:, :1])
        # F.pad shift order (l.93): W right, W left, H down, H up
        right = jnp.concatenate([zc, img[:, :, :-1]], axis=2)
        left = jnp.concatenate([img[:, :, 1:], zc], axis=2)
        down = jnp.concatenate([zr, img[:, :-1]], axis=1)
        up = jnp.concatenate([img[:, 1:], zr], axis=1)
        stacked = jnp.concatenate([img, right, left, down, up], axis=-1)
        x = rearrange(stacked, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)",
                      p1=self.patch_size, p2=self.patch_size)
        x = nn.LayerNorm(name="norm")(x)
        return nn.Dense(self.dim, name="proj")(x)


class _LSA(nn.Module):
    """vit_for_small_dataset.py:30-64: locality self-attention with a
    learned log temperature and the diagonal masked out."""

    dim: int
    heads: int
    dim_head: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        h = self.heads
        inner = h * self.dim_head
        y = nn.LayerNorm(name="norm")(x)
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = rearrange(q, "b n (h d) -> b h n d", h=h)
        k = rearrange(k, "b n (h d) -> b h n d", h=h)
        v = rearrange(v, "b n (h d) -> b h n d", h=h)
        temperature = self.param(
            "temperature",
            lambda _: jnp.log(jnp.asarray(self.dim_head ** -0.5)))
        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * jnp.exp(temperature)
        eye = jnp.eye(dots.shape[-1], dtype=bool)
        dots = jnp.where(eye, jnp.finfo(dots.dtype).min, dots)
        attn = jax.nn.softmax(dots, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = rearrange(jnp.einsum("bhij,bhjd->bhid", attn, v),
                        "b h n d -> b n (h d)")
        out = nn.Dense(self.dim, name="to_out")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class ViTForSmallDataset(nn.Module):
    """vit_for_small_dataset.py:98-140 (SPT + LSA)."""

    image_size: Union[int, Sequence[int]]
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
        assert self.pool in ("cls", "mean")
        h, w = _pair(self.image_size)
        num_patches = (h // self.patch_size) * (w // self.patch_size)
        x = _SPT(self.dim, self.patch_size, name="to_patch")(img)
        b, n = x.shape[0], x.shape[1]
        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (1, 1, self.dim))
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, num_patches + 1, self.dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.dim)), x], axis=1)
        x = x + pos[:, :n + 1]
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)
        for i in range(self.depth):
            x = x + _LSA(self.dim, self.heads, self.dim_head, self.dropout,
                         name=f"attn_{i}")(x, deterministic=deterministic)
            x = x + _FeedForward(self.dim, self.mlp_dim, self.dropout,
                                 name=f"ff_{i}")(x,
                                                 deterministic=deterministic)
        pooled = jnp.mean(x, axis=1) if self.pool == "mean" else x[:, 0]
        pooled = nn.LayerNorm(name="head_norm")(pooled)
        return nn.Dense(self.num_classes, name="head")(pooled)


class ParallelViT(nn.Module):
    """parallel_vit.py:90-135: per layer, N parallel attention branches
    summed into the residual, then N parallel feed-forward branches
    (Touvron et al.).  The patch embedding has no LayerNorms (l.102-105,
    a reference quirk vs the other members)."""

    image_size: Union[int, Sequence[int]]
    patch_size: Union[int, Sequence[int]]
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    pool: str = "cls"
    num_parallel_branches: int = 2
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0

    @nn.compact
    def __call__(self, img: Array, *, deterministic: bool = True) -> Array:
        assert self.pool in ("cls", "mean")
        h, w = _pair(self.image_size)
        p1, p2 = _pair(self.patch_size)
        num_patches = (h // p1) * (w // p2)
        x = rearrange(img, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)",
                      p1=p1, p2=p2)
        x = nn.Dense(self.dim, name="patch_proj")(x)
        b, n = x.shape[0], x.shape[1]
        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (1, 1, self.dim))
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, num_patches + 1, self.dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.dim)), x], axis=1)
        x = x + pos[:, :n + 1]
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)
        for i in range(self.depth):
            x = x + sum(
                _Attention(self.dim, self.heads, self.dim_head, self.dropout,
                           name=f"attn_{i}_{j}")(x,
                                                 deterministic=deterministic)
                for j in range(self.num_parallel_branches))
            x = x + sum(
                _FeedForward(self.dim, self.mlp_dim, self.dropout,
                             name=f"ff_{i}_{j}")(x,
                                                 deterministic=deterministic)
                for j in range(self.num_parallel_branches))
        pooled = jnp.mean(x, axis=1) if self.pool == "mean" else x[:, 0]
        pooled = nn.LayerNorm(name="head_norm")(pooled)
        return nn.Dense(self.num_classes, name="head")(pooled)


class _LocalFeedForward(nn.Module):
    """local_vit.py:41-59: conv1x1 -> hardswish -> depthwise 3x3 ->
    hardswish -> conv1x1 on the 2D patch grid.  Norm over channels
    (see module docstring for the reference NCHW-LayerNorm quirk)."""

    dim: int
    hidden_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        n = x.shape[1]
        side = int(round(n ** 0.5))
        y = rearrange(x, "b (h w) c -> b h w c", h=side)
        y = nn.LayerNorm(name="norm")(y)
        y = nn.hard_swish(nn.Dense(self.hidden_dim, name="fc1")(y))
        y = nn.Conv(self.hidden_dim, (3, 3), padding=1,
                    feature_group_count=self.hidden_dim, name="dw")(y)
        y = nn.hard_swish(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.Dense(self.dim, name="fc2")(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return rearrange(y, "b h w c -> b (h w) c")


class LocalViT(nn.Module):
    """local_vit.py:114-150: ViT whose feed-forward is a depthwise-conv
    block applied on the 2D grid with the CLS token excluded
    (ExcludeCLS, l.19-27)."""

    image_size: int
    patch_size: int
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0

    @nn.compact
    def __call__(self, img: Array, *, deterministic: bool = True) -> Array:
        assert self.image_size % self.patch_size == 0
        num_patches = (self.image_size // self.patch_size) ** 2
        x = rearrange(img, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)",
                      p1=self.patch_size, p2=self.patch_size)
        x = nn.LayerNorm(name="patch_norm1")(x)
        x = nn.Dense(self.dim, name="patch_proj")(x)
        x = nn.LayerNorm(name="patch_norm2")(x)
        b, n = x.shape[0], x.shape[1]
        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (1, 1, self.dim))
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, num_patches + 1, self.dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.dim)), x], axis=1)
        x = x + pos[:, :n + 1]
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)
        for i in range(self.depth):
            x = x + _Attention(self.dim, self.heads, self.dim_head,
                               self.dropout, name=f"attn_{i}")(
                x, deterministic=deterministic)
            cls_tok, patches = x[:, :1], x[:, 1:]
            patches = patches + _LocalFeedForward(
                self.dim, self.mlp_dim, self.dropout, name=f"ff_{i}")(
                patches, deterministic=deterministic)
            x = jnp.concatenate([cls_tok, patches], axis=1)
        cls_out = nn.LayerNorm(name="head_norm")(x[:, 0])
        return nn.Dense(self.num_classes, name="head")(cls_out)


class EfficientViT(nn.Module):
    """efficient.py:9-49: the ViT shell with a pluggable transformer
    backbone (any flax module taking (B, N, D) -> (B, N, D))."""

    image_size: Union[int, Sequence[int]]
    patch_size: int
    num_classes: int
    dim: int
    transformer: nn.Module
    pool: str = "cls"

    @nn.compact
    def __call__(self, img: Array) -> Array:
        assert self.pool in ("cls", "mean")
        h, w = _pair(self.image_size)
        num_patches = (h // self.patch_size) * (w // self.patch_size)
        x = rearrange(img, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)",
                      p1=self.patch_size, p2=self.patch_size)
        x = nn.LayerNorm(name="patch_norm1")(x)
        x = nn.Dense(self.dim, name="patch_proj")(x)
        x = nn.LayerNorm(name="patch_norm2")(x)
        b, n = x.shape[0], x.shape[1]
        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (1, 1, self.dim))
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, num_patches + 1, self.dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.dim)), x], axis=1)
        x = x + pos[:, :n + 1]
        x = self.transformer(x)
        pooled = jnp.mean(x, axis=1) if self.pool == "mean" else x[:, 0]
        pooled = nn.LayerNorm(name="head_norm")(pooled)
        return nn.Dense(self.num_classes, name="head")(pooled)


class _FusedAttention(nn.Module):
    """simple_flash_attn_vit.py:100-122 via
    ``jax.nn.dot_product_attention`` (fused attention on TPU)."""

    dim: int
    heads: int
    dim_head: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = self.heads
        inner = h * self.dim_head
        y = nn.LayerNorm(name="norm")(x)
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = rearrange(q, "b n (h d) -> b n h d", h=h)
        k = rearrange(k, "b n (h d) -> b n h d", h=h)
        v = rearrange(v, "b n (h d) -> b n h d", h=h)
        out = jax.nn.dot_product_attention(q, k, v)
        out = rearrange(out, "b n h d -> b n (h d)")
        return nn.Dense(self.dim, use_bias=False, name="to_out")(out)


class SimpleFlashAttnViT(nn.Module):
    """simple_flash_attn_vit.py:139-176."""

    image_size: Union[int, Sequence[int]]
    patch_size: Union[int, Sequence[int]]
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
        x = nn.LayerNorm(name="patch_norm1")(x)
        x = nn.Dense(self.dim, name="patch_proj")(x)
        x = nn.LayerNorm(name="patch_norm2")(x)
        x = x + _posemb_sincos_2d(h // p1, w // p2, self.dim)
        for i in range(self.depth):
            x = x + _FusedAttention(self.dim, self.heads, self.dim_head,
                                    name=f"attn_{i}")(x)
            x = x + _FeedForward(self.dim, self.mlp_dim, name=f"ff_{i}")(x)
        x = nn.LayerNorm(name="final_norm")(x)
        return nn.Dense(self.num_classes, name="linear_head")(
            jnp.mean(x, axis=1))
