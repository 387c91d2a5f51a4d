"""ViT zoo, round 3 (final batch): the remaining dormant members of the
reference's vit_pytorch_diy collection -- token-sampling / rotary /
packed models, the SSL & adapter wrappers, and the introspection
utilities.

Rebuilt TPU-first from the reference modules' *behavior*: channels-last
(B, H, W, C) images, einsum attention, and -- the defining constraint of
this batch -- STATIC shapes under jit.  Where the reference leans on
dynamic-shape torch ops (``torch.unique`` + ``pad_sequence`` in ATS,
variable-length packing in NaViT, forward hooks in Extractor/Recorder)
the rebuild keeps the same math on fixed-size buffers with masks, or
uses flax's functional intermediates capture:

* ``ATSViT`` -- ats_vit.py: adaptive token sampling.  Gumbel-max
  samples ``k`` token ids from the value-norm-weighted CLS attention
  (ats_vit.py:48-109); the reference dedups with ``torch.unique`` and
  right-pads, here duplicates are detected on the SORTED id vector and
  zeroed into padding slots (id 0 == CLS row, mask False), giving the
  identical {kept ids, mask} set with a static ``k+1`` token count per
  layer.
* ``RvT`` -- rvt.py: 2D axial rotary embeddings on q/k (CLS excluded),
  depthwise-conv spatial queries, GEGLU feed-forward.
* ``NaViT`` -- na_vit.py: multi-resolution image packing.  The device
  side consumes pre-packed fixed-length token buffers (patches,
  factorized 2D positions, image ids, key-pad mask) and does the
  packed-attention + masked per-image attention pooling; the host-side
  ``pack_images`` / ``group_images_by_max_seq_len`` mirror the
  reference's grouping and token-dropout (na_vit.py:31-70,246-330) and
  emit padded numpy buffers.  Validity is returned as a mask instead of
  the reference's dynamic ``x[is_images]`` gather.
* ``SimMIM`` -- simmim.py: masked-patch pretraining; the reference's
  ``L1/num_masked`` loss normalization quirk (simmim.py:86) is kept.
* ``MP3ViT``/``MP3`` -- mp3.py: masked position prediction; the full
  token set (without position embedding) cross-attends to the unmasked
  subset, and every token classifies its own patch index.
* ``DistillableViT``/``DistillWrapper``/``distill_loss`` -- distill.py:
  DeiT-style distillation token + soft-KL / hard-CE teacher loss.  The
  teacher's logits are an input (computed outside and stop-gradient'd)
  rather than a hooked submodule.
* ``MemoryViT``/``MemoryAdapter`` -- learnable_memory_vit.py: frozen
  backbone adapted with per-layer learnable memory tokens in k/v and a
  memory-CLS query, under the reference's one-way attention mask (main
  tokens see neither the memory CLS nor the memories, so the backbone's
  own outputs are bit-preserved).  Freezing is an optimizer concern in
  JAX -- mask the ``vit`` subtree with ``optax.masked`` (the repo's
  frozen-generator pattern, training/classify_trainer.py).
* ``EsViTProjector``/``esvit_view_loss``/``esvit_region_loss`` --
  es_vit.py: view- and region-level DINO losses (the region loss
  matches each student region to its max-cosine-similarity teacher
  region, es_vit.py:61-80) and the projector MLP with the reference's
  GELU-on-every-layer quirk (es_vit.py:118-140, the ``is_last``
  comparison that never fires).  Teacher EMA + centering reuse
  ``vit_zoo.ema_update``; the crop/jitter view pipeline
  (es_vit.py:244-268) is ``data/augment2d.py`` -- JAX-native,
  on-device, per-sample (``ssl_views_batch``).
* ``MaxViTWithRegisters`` -- max_vit_with_registers.py: MaxViT (MBConv
  + block/grid window attention, reusing vit_zoo_hier's blocks) with
  per-block register tokens packed in front of every window, a shared
  bias-table row for register pairs, and window-mean register carry
  between block and grid attention.
* ``extract`` / ``record_attention`` -- extractor.py / recorder.py:
  the torch forward-hook utilities become functional capture: flax
  ``capture_intermediates`` for layer embeddings, and a sown
  post-softmax attention tensor (models/vit.py ViTAttention) stacked
  across layers.
"""

from __future__ import annotations

import re
from typing import Callable, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange, repeat
from flax import linen as nn

from gfe_mamba_tpu.models.vit import ViTTransformer
from gfe_mamba_tpu.models.vit_zoo import _posemb_sincos_2d
from gfe_mamba_tpu.models.vit_zoo_hier import _MBConv, _TokenFeedForward

Array = jax.Array

_NEG = -1e9


def _pair(t):
    return tuple(t) if isinstance(t, (tuple, list)) else (t, t)


# ---------------------------------------------------------------------------
# ATS-ViT (ats_vit.py)
# ---------------------------------------------------------------------------


def _ats_sample(attn: Array, v: Array, mask: Array, k: int,
                rng: Array, eps: float = 1e-6):
    """Adaptive token sampling (ats_vit.py:48-109), static-shape.

    Returns ``(ids, new_mask)`` where ``ids`` is (B, k+1) with a leading
    0 (the CLS row) and sampled ids in [1, N-1]; duplicate draws are
    zeroed and masked instead of the reference's unique+right-pad, so
    the kept-id set and mask semantics are identical with a fixed shape.
    """
    b = attn.shape[0]
    cls_attn = attn[:, :, 0, 1:]                          # (b, h, n-1)
    value_norms = jnp.linalg.norm(v[:, :, 1:, :], axis=-1)
    scores = jnp.einsum("bhn,bhn->bn", cls_attn, value_norms)
    normed = scores / (scores.sum(axis=-1, keepdims=True) + eps)
    pseudo = jnp.log(normed + eps)
    pseudo = jnp.where(mask[:, 1:], pseudo, _NEG)
    pseudo = repeat(pseudo, "b n -> b k n", k=k)
    gumbel = -jnp.log(-jnp.log(
        jax.random.uniform(rng, pseudo.shape) + eps) + eps)
    ids = jnp.argmax(pseudo + gumbel, axis=-1) + 1        # (b, k)

    ids = jnp.sort(ids, axis=-1)
    dup = jnp.concatenate(
        [jnp.zeros((b, 1), bool), ids[:, 1:] == ids[:, :-1]], axis=1)
    ids = jnp.where(dup, 0, ids)
    # kept ids ascending, padding (0) slots pushed to the right, matching
    # the reference's pad_sequence layout
    order = jnp.argsort(jnp.where(ids == 0, jnp.iinfo(jnp.int32).max, ids),
                        axis=-1)
    ids = jnp.take_along_axis(ids, order, axis=-1)
    new_mask = jnp.concatenate(
        [jnp.ones((b, 1), bool), ids != 0], axis=1)
    ids = jnp.concatenate([jnp.zeros((b, 1), ids.dtype), ids], axis=1)
    return ids, new_mask


class _ATSAttention(nn.Module):
    """ats_vit.py:127-175: masked attention that optionally subsamples
    its output rows down to ``output_num_tokens`` (+ CLS)."""

    heads: int
    dim_head: int
    dropout: float = 0.0
    output_num_tokens: Optional[int] = None

    @nn.compact
    def __call__(self, x: Array, mask: Array, *, train: bool = False):
        dim, n = x.shape[-1], x.shape[1]
        inner = self.heads * self.dim_head
        y = nn.LayerNorm(name="norm")(x)
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(y)
        q, k, v = (rearrange(t, "b n (h d) -> b h n d", h=self.heads)
                   for t in jnp.split(qkv, 3, axis=-1))
        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * self.dim_head ** -0.5
        pair_mask = mask[:, None, :, None] & mask[:, None, None, :]
        dots = jnp.where(pair_mask, dots, _NEG)
        attn = jax.nn.softmax(dots, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)

        ids = None
        if self.output_num_tokens is not None and \
                (n - 1) > self.output_num_tokens:
            ids, mask = _ats_sample(attn, v, mask, self.output_num_tokens,
                                    self.make_rng("gumbel"))
            attn = jnp.take_along_axis(
                attn, ids[:, None, :, None], axis=2)

        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = rearrange(out, "b h n d -> b n (h d)")
        out = nn.Dense(dim, name="to_out")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out, mask, ids


class ATSViT(nn.Module):
    """ats_vit.py:215-262: ViT whose token count shrinks per layer via
    adaptive token sampling.  Needs an ``rngs={'gumbel': ...}`` key
    (the reference samples in eval too, ats_vit.py:80)."""

    image_size: Union[int, Sequence[int]]
    patch_size: Union[int, Sequence[int]]
    num_classes: int
    dim: int
    depth: int
    max_tokens_per_depth: Sequence[int]
    heads: int
    mlp_dim: int
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0

    @nn.compact
    def __call__(self, img: Array, *, train: bool = False,
                 return_sampled_token_ids: bool = False):
        assert len(self.max_tokens_per_depth) == self.depth
        assert sorted(self.max_tokens_per_depth, reverse=True) == \
            list(self.max_tokens_per_depth)
        h, w = _pair(self.image_size)
        p1, p2 = _pair(self.patch_size)
        n = (h // p1) * (w // p2)

        x = rearrange(img, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)",
                      p1=p1, p2=p2)
        x = nn.LayerNorm()(x)
        x = nn.Dense(self.dim)(x)
        x = nn.LayerNorm()(x)
        b = x.shape[0]
        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (1, 1, self.dim))
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, n + 1, self.dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.dim)), x], axis=1) + pos
        x = nn.Dropout(self.emb_dropout, deterministic=not train)(x)

        mask = jnp.ones((b, x.shape[1]), bool)
        token_ids = repeat(jnp.arange(x.shape[1]), "n -> b n", b=b)
        for i, out_k in enumerate(self.max_tokens_per_depth):
            attn_out, mask, ids = _ATSAttention(
                self.heads, self.dim_head, self.dropout,
                output_num_tokens=out_k, name=f"attn_{i}")(
                x, mask, train=train)
            if ids is not None:
                batch = jnp.arange(b)[:, None]
                x = x[batch, ids]
                token_ids = token_ids[batch, ids]
            x = x + attn_out
            x = _FinalFeedForward(self.mlp_dim, self.dropout,
                                  name=f"ff_{i}")(x, train=train) + x

        logits = nn.Dense(self.num_classes, name="mlp_head_dense")(
            nn.LayerNorm(name="mlp_head_norm")(x[:, 0]))
        if return_sampled_token_ids:
            # -1 marks padding, as in the reference (ats_vit.py:257-260)
            return logits, token_ids[:, 1:] - 1
        return logits


class _FinalFeedForward(nn.Module):
    """Pre-norm MLP (ats_vit.py:113-125 / mp3.py:36-48)."""

    hidden_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        y = nn.LayerNorm(name="norm")(x)
        y = nn.Dense(self.hidden_dim, name="fc1")(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(nn.gelu(y))
        y = nn.Dense(x.shape[-1], name="fc2")(y)
        return nn.Dropout(self.dropout, deterministic=not train)(y)


# ---------------------------------------------------------------------------
# Rotary ViT (rvt.py)
# ---------------------------------------------------------------------------


def _axial_rotary(n: int, dim_head: int, max_freq: float):
    """rvt.py:18-44: 2D axial rotary sin/cos of shape (n*n, 2*(dim//4)*2)."""
    scales = np.linspace(1.0, max_freq / 2, dim_head // 4)
    seq = np.linspace(-1.0, 1.0, n)[:, None] * scales[None, :] * np.pi
    x_sinu = repeat(seq, "i d -> i j d", j=n)
    y_sinu = repeat(seq, "j d -> i j d", i=n)
    sin = np.concatenate([np.sin(x_sinu), np.sin(y_sinu)], axis=-1)
    cos = np.concatenate([np.cos(x_sinu), np.cos(y_sinu)], axis=-1)
    sin, cos = (rearrange(t, "i j d -> (i j) d") for t in (sin, cos))
    # interleaved duplication: 'n d -> n (d j)', j=2
    sin, cos = (np.repeat(t, 2, axis=-1) for t in (sin, cos))
    return jnp.asarray(sin, jnp.float32), jnp.asarray(cos, jnp.float32)


def _rotate_every_two(x: Array) -> Array:
    x = rearrange(x, "... (d j) -> ... d j", j=2)
    x1, x2 = x[..., 0], x[..., 1]
    return rearrange(jnp.stack([-x2, x1], axis=-1), "... d j -> ... (d j)")


class _SpatialConv(nn.Module):
    """rvt.py:58-70: depthwise conv + 1x1 over the patch grid for the
    query projection; CLS token projected separately."""

    dim_out: int
    kernel: int

    @nn.compact
    def __call__(self, x: Array, fmap: int) -> Array:
        cls_tok, tokens = x[:, :1], x[:, 1:]
        g = rearrange(tokens, "b (h w) d -> b h w d", h=fmap)
        g = nn.Conv(g.shape[-1], (self.kernel, self.kernel),
                    padding=self.kernel // 2,
                    feature_group_count=g.shape[-1], use_bias=False,
                    name="dw")(g)
        g = nn.Dense(self.dim_out, use_bias=False, name="pw")(g)
        g = rearrange(g, "b h w d -> b (h w) d")
        if cls_tok.shape[-1] != self.dim_out:
            cls_tok = nn.Dense(self.dim_out, name="cls_proj")(cls_tok)
        return jnp.concatenate([cls_tok, g], axis=1)


class _RvTAttention(nn.Module):
    """rvt.py:91-153."""

    heads: int
    dim_head: int
    dropout: float = 0.0
    use_rotary: bool = True
    use_ds_conv: bool = True
    conv_query_kernel: int = 5

    @nn.compact
    def __call__(self, x: Array, sin: Array, cos: Array, fmap: int,
                 *, train: bool = False) -> Array:
        dim = x.shape[-1]
        inner = self.heads * self.dim_head
        y = nn.LayerNorm(name="norm")(x)
        if self.use_ds_conv:
            q = _SpatialConv(inner, self.conv_query_kernel, name="to_q")(
                y, fmap)
        else:
            q = nn.Dense(inner, use_bias=False, name="to_q")(y)
        k, v = jnp.split(
            nn.Dense(inner * 2, use_bias=False, name="to_kv")(y), 2, axis=-1)
        q, k, v = (rearrange(t, "b n (h d) -> (b h) n d", h=self.heads)
                   for t in (q, k, v))

        if self.use_rotary:
            rot = sin.shape[-1]
            (q_cls, q), (k_cls, k) = ((t[:, :1], t[:, 1:]) for t in (q, k))
            (q, q_pass), (k, k_pass) = (
                (t[..., :rot], t[..., rot:]) for t in (q, k))
            q, k = (t * cos + _rotate_every_two(t) * sin for t in (q, k))
            q = jnp.concatenate([q, q_pass], axis=-1)
            k = jnp.concatenate([k, k_pass], axis=-1)
            q = jnp.concatenate([q_cls, q], axis=1)
            k = jnp.concatenate([k_cls, k], axis=1)

        dots = jnp.einsum("bid,bjd->bij", q, k) * self.dim_head ** -0.5
        attn = jax.nn.softmax(dots, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bij,bjd->bid", attn, v)
        out = rearrange(out, "(b h) n d -> b n (h d)", h=self.heads)
        out = nn.Dense(dim, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class _GEGLUFeedForward(nn.Module):
    """rvt.py:72-89: LN -> Dense(2*hidden) -> gelu(gates)*x -> Dense."""

    hidden_dim: int
    dropout: float = 0.0
    use_glu: bool = True

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        dim = x.shape[-1]
        y = nn.LayerNorm(name="norm")(x)
        if self.use_glu:
            y = nn.Dense(self.hidden_dim * 2, name="fc1")(y)
            val, gates = jnp.split(y, 2, axis=-1)
            y = nn.gelu(gates) * val
        else:
            y = nn.gelu(nn.Dense(self.hidden_dim, name="fc1")(y))
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(dim, name="fc2")(y)
        return nn.Dropout(self.dropout, deterministic=not train)(y)


class RvT(nn.Module):
    """rvt.py:175-208: rotary vision transformer."""

    image_size: int
    patch_size: int
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    dim_head: int = 64
    dropout: float = 0.0
    use_rotary: bool = True
    use_ds_conv: bool = True
    use_glu: bool = True

    @nn.compact
    def __call__(self, img: Array, *, train: bool = False) -> Array:
        p = self.patch_size
        fmap = self.image_size // p
        x = rearrange(img, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)",
                      p1=p, p2=p)
        x = nn.Dense(self.dim, name="patch_embed")(x)
        b = x.shape[0]
        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (1, 1, self.dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.dim)), x], axis=1)

        sin, cos = _axial_rotary(fmap, self.dim_head,
                                 max_freq=float(self.image_size))
        for i in range(self.depth):
            x = _RvTAttention(self.heads, self.dim_head, self.dropout,
                              self.use_rotary, self.use_ds_conv,
                              name=f"attn_{i}")(
                x, sin, cos, fmap, train=train) + x
            x = _GEGLUFeedForward(self.mlp_dim, self.dropout, self.use_glu,
                                  name=f"ff_{i}")(x, train=train) + x

        return nn.Dense(self.num_classes, name="mlp_head_dense")(
            nn.LayerNorm(name="mlp_head_norm")(x[:, 0]))


# ---------------------------------------------------------------------------
# NaViT (na_vit.py) -- packed multi-resolution training
# ---------------------------------------------------------------------------


class _HeadRMSNorm(nn.Module):
    """na_vit.py:86-94: per-head RMS norm with learned gamma, scale
    folded in (no extra attention scale)."""

    heads: int
    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        gamma = self.param("gamma", nn.initializers.ones,
                           (self.heads, 1, self.dim))
        normed = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
        return normed * self.dim ** 0.5 * gamma


class _NaViTAttention(nn.Module):
    """na_vit.py:108-160: bias-free LN, q/k RMS norm, key-pad and
    pairwise attention masks, optional cross-attention context."""

    heads: int
    dim_head: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None,
                 mask: Optional[Array] = None,
                 attn_mask: Optional[Array] = None,
                 *, train: bool = False) -> Array:
        dim = x.shape[-1]
        inner = self.heads * self.dim_head
        y = nn.LayerNorm(use_bias=False, name="norm")(x)
        kv_in = context if context is not None else y
        q = nn.Dense(inner, use_bias=False, name="to_q")(y)
        k, v = jnp.split(
            nn.Dense(inner * 2, use_bias=False, name="to_kv")(kv_in),
            2, axis=-1)
        q, k, v = (rearrange(t, "b n (h d) -> b h n d", h=self.heads)
                   for t in (q, k, v))
        q = _HeadRMSNorm(self.heads, self.dim_head, name="q_norm")(q)
        k = _HeadRMSNorm(self.heads, self.dim_head, name="k_norm")(k)
        dots = jnp.einsum("bhid,bhjd->bhij", q, k)
        if mask is not None:
            dots = jnp.where(mask[:, None, None, :], dots, _NEG)
        if attn_mask is not None:
            dots = jnp.where(attn_mask, dots, _NEG)
        attn = jax.nn.softmax(dots, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = rearrange(out, "b h n d -> b n (h d)")
        out = nn.Dense(dim, use_bias=False, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class NaViT(nn.Module):
    """na_vit.py:186-389, packed-core half.

    Device-side model over host-packed buffers (see ``pack_images``):
    ``patches`` (B, L, p*p*c), ``positions`` (B, L, 2) int patch
    coordinates, ``image_ids`` (B, L) int, ``mask`` (B, L) bool.
    Returns ``(logits, valid)`` where ``logits`` is
    (B, max_images, num_classes) and ``valid`` marks which query slots
    correspond to real images -- the static-shape replacement for the
    reference's ``x[is_images]``.
    """

    image_size: Union[int, Sequence[int]]
    patch_size: int
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    max_images: int = 4
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0

    @nn.compact
    def __call__(self, patches: Array, positions: Array, image_ids: Array,
                 mask: Array, *, train: bool = False):
        h, w = _pair(self.image_size)
        p = self.patch_size
        b = patches.shape[0]

        x = nn.LayerNorm(use_bias=False, name="patch_norm1")(patches)
        x = nn.Dense(self.dim, name="patch_embed")(x)
        x = nn.LayerNorm(use_bias=False, name="patch_norm2")(x)

        pos_h = self.param("pos_embed_height", nn.initializers.normal(1.0),
                           (h // p, self.dim))
        pos_w = self.param("pos_embed_width", nn.initializers.normal(1.0),
                           (w // p, self.dim))
        x = x + pos_h[positions[..., 0]] + pos_w[positions[..., 1]]
        x = nn.Dropout(self.emb_dropout, deterministic=not train)(x)

        same_image = image_ids[:, None, :, None] == image_ids[:, None, None, :]
        attn_mask = same_image & mask[:, None, None, :]
        for i in range(self.depth):
            x = _NaViTAttention(self.heads, self.dim_head, self.dropout,
                                name=f"attn_{i}")(
                x, attn_mask=attn_mask, train=train) + x
            x = _BiaslessFeedForward(self.mlp_dim, self.dropout,
                                     name=f"ff_{i}")(x, train=train) + x
        x = nn.LayerNorm(use_bias=False, name="final_norm")(x)

        # masked per-image attention pooling (na_vit.py:356-374)
        queries = self.param("attn_pool_queries",
                             nn.initializers.normal(1.0), (self.dim,))
        queries = jnp.broadcast_to(queries,
                                   (b, self.max_images, self.dim))
        img_arange = jnp.arange(self.max_images)
        pool_mask = (img_arange[None, :, None] == image_ids[:, None, :]) \
            & mask[:, None, :]
        pooled = _NaViTAttention(self.heads, self.dim_head,
                                 name="attn_pool")(
            queries, context=x, attn_mask=pool_mask[:, None],
            train=train) + queries

        logits = nn.Dense(self.num_classes, use_bias=False,
                          name="mlp_head_dense")(
            nn.LayerNorm(use_bias=False, name="mlp_head_norm")(pooled))
        valid = img_arange[None, :] < \
            (jnp.max(jnp.where(mask, image_ids, -1), axis=-1) + 1)[:, None]
        return logits, valid


class _BiaslessFeedForward(nn.Module):
    """na_vit.py:98-106 (bias-free LN front)."""

    hidden_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        y = nn.LayerNorm(use_bias=False, name="norm")(x)
        y = nn.Dense(self.hidden_dim, name="fc1")(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(nn.gelu(y))
        y = nn.Dense(x.shape[-1], name="fc2")(y)
        return nn.Dropout(self.dropout, deterministic=not train)(y)


def group_images_by_max_seq_len(
        images: List[np.ndarray], patch_size: int,
        calc_token_dropout: Optional[Callable] = None,
        max_seq_len: int = 2048) -> List[List[np.ndarray]]:
    """na_vit.py:31-70: greedy first-fit grouping of (h, w, c) images."""
    if calc_token_dropout is None:
        calc_token_dropout = lambda h, w: 0.0
    groups, group, seq_len = [], [], 0
    for image in images:
        ph, pw = (d // patch_size for d in image.shape[:2])
        n = int(ph * pw * (1 - calc_token_dropout(*image.shape[:2])))
        assert n <= max_seq_len, "image exceeds max_seq_len"
        if seq_len + n > max_seq_len:
            groups.append(group)
            group, seq_len = [], 0
        group.append(image)
        seq_len += n
    if group:
        groups.append(group)
    return groups


def pack_images(grouped: Sequence[Sequence[np.ndarray]], patch_size: int,
                max_seq_len: int,
                token_dropout_prob: Optional[Union[float, Callable]] = None,
                seed: int = 0):
    """Host-side packer (na_vit.py:267-333): patchify each group's
    images into one fixed-length token buffer with factorized 2D
    positions, per-token image ids and a key-pad mask.

    Returns dict of numpy arrays sized (B, max_seq_len, ...), ready for
    ``NaViT.__call__`` -- every batch compiles to the same XLA program.
    """
    rng = np.random.default_rng(seed)
    if token_dropout_prob is None:
        calc_drop = None
    elif callable(token_dropout_prob):
        calc_drop = token_dropout_prob
    else:
        calc_drop = lambda h, w: float(token_dropout_prob)

    p = patch_size
    c = grouped[0][0].shape[-1]
    patch_dim = c * p * p
    b = len(grouped)
    patches = np.zeros((b, max_seq_len, patch_dim), np.float32)
    positions = np.zeros((b, max_seq_len, 2), np.int32)
    image_ids = np.zeros((b, max_seq_len), np.int32)
    mask = np.zeros((b, max_seq_len), bool)

    for gi, images in enumerate(grouped):
        offset = 0
        for image_id, image in enumerate(images):
            h, w = image.shape[:2]
            assert h % p == 0 and w % p == 0
            ph, pw = h // p, w // p
            seq = rearrange(image, "(h p1) (w p2) c -> (h w) (c p1 p2)",
                            p1=p, p2=p)
            pos = np.stack(np.meshgrid(np.arange(ph), np.arange(pw),
                                       indexing="ij"), axis=-1)
            pos = pos.reshape(-1, 2)
            if calc_drop is not None:
                keep = max(1, int(seq.shape[0] * (1 - calc_drop(h, w))))
                idx = rng.permutation(seq.shape[0])[:keep]
                seq, pos = seq[idx], pos[idx]
            n = seq.shape[0]
            assert offset + n <= max_seq_len, "group overflows max_seq_len"
            patches[gi, offset:offset + n] = seq
            positions[gi, offset:offset + n] = pos
            image_ids[gi, offset:offset + n] = image_id
            mask[gi, offset:offset + n] = True
            offset += n
    return {"patches": patches, "positions": positions,
            "image_ids": image_ids, "mask": mask}


# ---------------------------------------------------------------------------
# SimMIM (simmim.py)
# ---------------------------------------------------------------------------


class SimMIM(nn.Module):
    """simmim.py:6-87: replace a random patch subset with a mask token,
    encode the FULL sequence, L1-reconstruct the masked patches.  The
    reference divides the already-averaged L1 by ``num_masked`` again
    (simmim.py:86); kept for parity."""

    image_size: Union[int, Sequence[int]]
    patch_size: Union[int, Sequence[int]]
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    masking_ratio: float = 0.5
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
            nn.LayerNorm(name="patch_norm1")(patches))
        tokens = nn.LayerNorm(name="patch_norm2")(tokens)
        # pos table keeps the encoder's CLS row for state-dict parity
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, n + 1, self.dim))[:, 1:]

        masked_idx = jax.lax.top_k(
            jax.random.uniform(rng, (b, n)), num_masked)[1]
        masked_bool = jnp.zeros((b, n), bool)
        batch = jnp.arange(b)[:, None]
        masked_bool = masked_bool.at[batch, masked_idx].set(True)

        mask_token = self.param("mask_token", nn.initializers.normal(1.0),
                                (self.dim,))
        tokens = jnp.where(masked_bool[..., None],
                           mask_token + pos, tokens + pos)

        encoded = ViTTransformer(self.depth, self.heads, self.dim_head,
                                 self.mlp_dim, 0.0, name="transformer")(
            tokens)
        pred = nn.Dense(patch_dim, name="to_pixels")(
            encoded[batch, masked_idx])
        target = patches[batch, masked_idx]
        return jnp.mean(jnp.abs(pred - target)) / num_masked


# ---------------------------------------------------------------------------
# MP3 -- masked position prediction (mp3.py)
# ---------------------------------------------------------------------------


class _MP3Transformer(nn.Module):
    """mp3.py:91-104: layers of (cross-)attention + FF; attention norms
    x and context with the SAME LayerNorm (mp3.py:75-77)."""

    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None,
                 *, train: bool = False) -> Array:
        for i in range(self.depth):
            x = _MP3Attention(self.heads, self.dim_head, self.dropout,
                              name=f"attn_{i}")(
                x, context=context, train=train) + x
            x = _FinalFeedForward(self.mlp_dim, self.dropout,
                                  name=f"ff_{i}")(x, train=train) + x
        return x


class _MP3Attention(nn.Module):
    heads: int
    dim_head: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None,
                 *, train: bool = False) -> Array:
        dim = x.shape[-1]
        inner = self.heads * self.dim_head
        norm = nn.LayerNorm(name="norm")
        y = norm(x)
        ctx = norm(context) if context is not None else y
        q = nn.Dense(inner, use_bias=False, name="to_q")(y)
        k, v = jnp.split(
            nn.Dense(inner * 2, use_bias=False, name="to_kv")(ctx),
            2, axis=-1)
        q, k, v = (rearrange(t, "b n (h d) -> b h n d", h=self.heads)
                   for t in (q, k, v))
        attn = jax.nn.softmax(
            jnp.einsum("bhid,bhjd->bhij", q, k) * self.dim_head ** -0.5,
            axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = rearrange(out, "b h n d -> b n (h d)")
        out = nn.Dense(dim, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class MP3ViT(nn.Module):
    """mp3.py:106-146: SimpleViT-flavored classifier whose transformer
    supports cross-attention context (used by MP3 pretraining)."""

    image_size: Union[int, Sequence[int]]
    patch_size: Union[int, Sequence[int]]
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    dim_head: int = 64
    dropout: float = 0.0

    def setup(self):
        self.patch_norm1 = nn.LayerNorm(name="patch_norm1")
        self.patch_embed = nn.Dense(self.dim, name="patch_embed")
        self.patch_norm2 = nn.LayerNorm(name="patch_norm2")
        self.transformer = _MP3Transformer(
            self.depth, self.heads, self.dim_head, self.mlp_dim,
            self.dropout, name="transformer")
        self.head_norm = nn.LayerNorm(name="head_norm")
        self.head = nn.Dense(self.num_classes, name="head")

    def to_tokens(self, img: Array) -> Array:
        """Patch embedding WITHOUT position information (mp3.py:166)."""
        h, w = _pair(self.image_size)
        p1, p2 = _pair(self.patch_size)
        x = rearrange(img, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)",
                      p1=p1, p2=p2)
        return self.patch_norm2(self.patch_embed(self.patch_norm1(x)))

    def __call__(self, img: Array, *, train: bool = False) -> Array:
        h, w = _pair(self.image_size)
        p1, p2 = _pair(self.patch_size)
        x = self.to_tokens(img) + _posemb_sincos_2d(
            h // p1, w // p2, self.dim)
        x = self.transformer(x, train=train)
        return self.head(self.head_norm(jnp.mean(x, axis=1)))


class MP3(nn.Module):
    """mp3.py:150-186: all (position-free) tokens cross-attend to a
    random unmasked subset; each token predicts its own patch index."""

    vit: MP3ViT
    masking_ratio: float

    @nn.compact
    def __call__(self, img: Array, rng: Array, *, train: bool = False):
        tokens = self.vit.to_tokens(img)
        b, n, _ = tokens.shape
        num_masked = int(self.masking_ratio * n)

        order = jax.vmap(lambda k: jax.random.permutation(k, n))(
            jax.random.split(rng, b))
        unmasked_idx = order[:, num_masked:]
        batch = jnp.arange(b)[:, None]
        tokens_unmasked = tokens[batch, unmasked_idx]

        attended = self.vit.transformer(tokens, context=tokens_unmasked,
                                        train=train)
        logits = nn.Dense(n, name="mlp_head_dense")(
            nn.LayerNorm(name="mlp_head_norm")(attended))   # (b, n, n)
        labels = jnp.arange(n)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(logp[:, labels, labels])


# ---------------------------------------------------------------------------
# Distillation (distill.py)
# ---------------------------------------------------------------------------


class DistillableViT(nn.Module):
    """distill.py:17-62: ViT that accepts an extra distillation token
    appended AFTER the position add; returns (logits, distill_out) when
    one is given."""

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

    @nn.compact
    def __call__(self, img: Array, distill_token: Optional[Array] = None,
                 *, train: bool = False):
        h, w = _pair(self.image_size)
        p1, p2 = _pair(self.patch_size)
        n = (h // p1) * (w // p2)
        x = rearrange(img, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)",
                      p1=p1, p2=p2)
        x = nn.LayerNorm()(x)
        x = nn.Dense(self.dim)(x)
        x = nn.LayerNorm()(x)
        b = x.shape[0]
        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (1, 1, self.dim))
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, n + 1, self.dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.dim)), x], axis=1) + pos

        distilling = distill_token is not None
        if distilling:
            x = jnp.concatenate(
                [x, jnp.broadcast_to(distill_token, (b, 1, self.dim))],
                axis=1)
        x = nn.Dropout(self.emb_dropout, deterministic=not train)(x)
        x = ViTTransformer(self.depth, self.heads, self.dim_head,
                           self.mlp_dim, self.dropout, name="transformer")(
            x, deterministic=not train)
        if distilling:
            x, distill_out = x[:, :-1], x[:, -1]
        x = jnp.mean(x, axis=1) if self.pool == "mean" else x[:, 0]
        logits = nn.Dense(self.num_classes, name="mlp_head")(x)
        if distilling:
            return logits, distill_out
        return logits


def distill_loss(student_logits: Array, distill_logits: Array,
                 teacher_logits: Array, labels: Array,
                 temperature: float = 1.0, alpha: float = 0.5,
                 hard: bool = False) -> Array:
    """distill.py:129-153: CE on labels + soft-KL (batchmean * T^2) or
    hard-CE against the (stop-gradient'd) teacher."""
    teacher_logits = jax.lax.stop_gradient(teacher_logits)
    ce = -jnp.mean(jnp.take_along_axis(
        jax.nn.log_softmax(student_logits, axis=-1),
        labels[:, None], axis=-1))
    if not hard:
        t = jax.nn.softmax(teacher_logits / temperature, axis=-1)
        log_s = jax.nn.log_softmax(distill_logits / temperature, axis=-1)
        log_t = jnp.log(t + 1e-20)
        dl = jnp.mean(jnp.sum(t * (log_t - log_s), axis=-1))
        dl = dl * temperature ** 2
    else:
        hard_labels = jnp.argmax(teacher_logits, axis=-1)
        dl = -jnp.mean(jnp.take_along_axis(
            jax.nn.log_softmax(distill_logits, axis=-1),
            hard_labels[:, None], axis=-1))
    return ce * (1 - alpha) + dl * alpha


class DistillWrapper(nn.Module):
    """distill.py:100-153 with the teacher's logits as an input (the
    teacher runs outside; JAX has no in-module no_grad)."""

    student: DistillableViT
    temperature: float = 1.0
    alpha: float = 0.5
    hard: bool = False

    @nn.compact
    def __call__(self, img: Array, labels: Array, teacher_logits: Array,
                 *, train: bool = False) -> Array:
        token = self.param("distillation_token",
                           nn.initializers.normal(1.0),
                           (1, 1, self.student.dim))
        student_logits, distill_tokens = self.student(
            img, distill_token=token, train=train)
        distill_logits = nn.Dense(self.student.num_classes,
                                  name="distill_mlp_dense")(
            nn.LayerNorm(name="distill_mlp_norm")(distill_tokens))
        return distill_loss(student_logits, distill_logits, teacher_logits,
                            labels, self.temperature, self.alpha, self.hard)


# ---------------------------------------------------------------------------
# Learnable-memory adapter (learnable_memory_vit.py)
# ---------------------------------------------------------------------------


class _MemAttention(nn.Module):
    """learnable_memory_vit.py:44-87: memories join k/v only; optional
    boolean attention mask."""

    heads: int
    dim_head: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, attn_mask: Optional[Array] = None,
                 memories: Optional[Array] = None,
                 *, train: bool = False) -> Array:
        dim = x.shape[-1]
        inner = self.heads * self.dim_head
        y = nn.LayerNorm(name="norm")(x)
        kv = y
        if memories is not None:
            if memories.ndim == 2:
                memories = jnp.broadcast_to(
                    memories, (y.shape[0],) + memories.shape)
            kv = jnp.concatenate([kv, memories], axis=1)
        q = nn.Dense(inner, use_bias=False, name="to_q")(y)
        k, v = jnp.split(
            nn.Dense(inner * 2, use_bias=False, name="to_kv")(kv),
            2, axis=-1)
        q, k, v = (rearrange(t, "b n (h d) -> b h n d", h=self.heads)
                   for t in (q, k, v))
        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * self.dim_head ** -0.5
        if attn_mask is not None:
            dots = jnp.where(attn_mask, dots, _NEG)
        attn = jax.nn.softmax(dots, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = rearrange(out, "b h n d -> b n (h d)")
        out = nn.Dense(dim, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class _MemTransformer(nn.Module):
    """learnable_memory_vit.py:89-105: per-layer memories."""

    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, attn_mask: Optional[Array] = None,
                 memories: Optional[Array] = None,
                 *, train: bool = False) -> Array:
        for i in range(self.depth):
            mem = memories[i] if memories is not None else None
            x = _MemAttention(self.heads, self.dim_head, self.dropout,
                              name=f"attn_{i}")(
                x, attn_mask=attn_mask, memories=mem, train=train) + x
            x = _FinalFeedForward(self.mlp_dim, self.dropout,
                                  name=f"ff_{i}")(x, train=train) + x
        return x


class MemoryViT(nn.Module):
    """learnable_memory_vit.py:107-153: the backbone ViT."""

    image_size: Union[int, Sequence[int]]
    patch_size: Union[int, Sequence[int]]
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0

    def setup(self):
        h, w = _pair(self.image_size)
        p1, p2 = _pair(self.patch_size)
        self.num_patches = (h // p1) * (w // p2)
        self.patch_norm1 = nn.LayerNorm(name="patch_norm1")
        self.patch_embed = nn.Dense(self.dim, name="patch_embed")
        self.patch_norm2 = nn.LayerNorm(name="patch_norm2")
        self.cls_token = self.param("cls_token",
                                    nn.initializers.normal(1.0),
                                    (1, 1, self.dim))
        self.pos_embedding = self.param("pos_embedding",
                                        nn.initializers.normal(1.0),
                                        (1, self.num_patches + 1, self.dim))
        self.emb_drop = nn.Dropout(self.emb_dropout)
        self.transformer = _MemTransformer(
            self.depth, self.heads, self.dim_head, self.mlp_dim,
            self.dropout, name="transformer")
        self.head_norm = nn.LayerNorm(name="head_norm")
        self.head = nn.Dense(self.num_classes, name="head")

    def img_to_tokens(self, img: Array, *, train: bool = False) -> Array:
        h, w = _pair(self.image_size)
        p1, p2 = _pair(self.patch_size)
        x = rearrange(img, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)",
                      p1=p1, p2=p2)
        x = self.patch_norm2(self.patch_embed(self.patch_norm1(x)))
        b = x.shape[0]
        x = jnp.concatenate(
            [jnp.broadcast_to(self.cls_token, (b, 1, self.dim)), x],
            axis=1) + self.pos_embedding
        return self.emb_drop(x, deterministic=not train)

    def __call__(self, img: Array, *, train: bool = False) -> Array:
        x = self.transformer(self.img_to_tokens(img, train=train),
                             train=train)
        return self.head(self.head_norm(x[:, 0]))


class MemoryAdapter(nn.Module):
    """learnable_memory_vit.py:157-218: memory CLS query + per-layer
    memory k/v tokens under the reference's one-way mask.  Freeze the
    ``vit`` param subtree with an optax mask to train only the
    memories and adapter head."""

    vit: MemoryViT
    num_memories_per_layer: int = 10
    num_classes: int = 2

    @nn.compact
    def __call__(self, img: Array, *, train: bool = False) -> Array:
        h, w = _pair(self.vit.image_size)
        p1, p2 = _pair(self.vit.patch_size)
        n = (h // p1) * (w // p2) + 1    # main tokens incl. backbone CLS
        m = self.num_memories_per_layer
        dim = self.vit.dim

        # queries: [mem_cls, main]; keys: [mem_cls, main, memories].
        # Main tokens attend only to main tokens (learnable_memory_vit.py
        # :193-196), so the frozen backbone's outputs are preserved.
        attn_mask = np.zeros((1 + n, 1 + n + m), dtype=bool)
        attn_mask[1:, 1:1 + n] = True
        attn_mask[0, :] = True
        attn_mask = jnp.asarray(attn_mask)

        mem_cls = self.param("memory_cls_token",
                             nn.initializers.normal(1.0), (dim,))
        memories = self.param("memories_per_layer",
                              nn.initializers.normal(1.0),
                              (self.vit.depth, m, dim))

        tokens = self.vit.img_to_tokens(img, train=train)
        b = tokens.shape[0]
        tokens = jnp.concatenate(
            [jnp.broadcast_to(mem_cls, (b, 1, dim)), tokens], axis=1)
        out = self.vit.transformer(tokens, attn_mask=attn_mask,
                                   memories=memories, train=train)
        return nn.Dense(self.num_classes, name="mlp_head_dense")(
            nn.LayerNorm(name="mlp_head_norm")(out[:, 0]))


# ---------------------------------------------------------------------------
# EsViT (es_vit.py) -- view & region losses, projector
# ---------------------------------------------------------------------------


class EsViTProjector(nn.Module):
    """es_vit.py:118-140: GELU MLP (the reference's is_last check never
    fires, so every layer is GELU'd -- kept), L2 norm, then the final
    prototype projection."""

    dim_out: int
    num_layers: int = 4
    hidden_size: int = 256

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(self.num_layers - 1):
            x = nn.gelu(nn.Dense(self.hidden_size, name=f"fc{i}")(x))
        x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-6)
        return nn.Dense(self.dim_out, name="out")(x)


def esvit_view_loss(teacher_logits: Array, student_logits: Array,
                    centers: Array, teacher_temp: float = 0.04,
                    student_temp: float = 0.9,
                    eps: float = 1e-20) -> Array:
    """es_vit.py:48-59."""
    teacher_logits = jax.lax.stop_gradient(teacher_logits)
    s = jax.nn.softmax(student_logits / student_temp, axis=-1)
    t = jax.nn.softmax((teacher_logits - centers) / teacher_temp, axis=-1)
    return -jnp.mean(jnp.sum(t * jnp.log(s + eps), axis=-1))


def esvit_region_loss(teacher_logits: Array, student_logits: Array,
                      teacher_latent: Array, student_latent: Array,
                      centers: Array, teacher_temp: float = 0.04,
                      student_temp: float = 0.9,
                      eps: float = 1e-20) -> Array:
    """es_vit.py:61-80: each student region is matched to the teacher
    region with maximal (dot-product) similarity."""
    teacher_logits = jax.lax.stop_gradient(teacher_logits)
    s = jax.nn.softmax(student_logits / student_temp, axis=-1)
    t = jax.nn.softmax((teacher_logits - centers) / teacher_temp, axis=-1)
    sim = jnp.einsum("bid,bjd->bij", student_latent, teacher_latent)
    idx = jnp.argmax(sim, axis=-1)                       # (b, n)
    matched_t = jnp.take_along_axis(t, idx[..., None], axis=1)
    return -jnp.mean(jnp.sum(matched_t * jnp.log(s + eps), axis=-1))


def esvit_center_update(center: Array, batch_center: Array,
                        momentum: float = 0.9) -> Array:
    """es_vit.py:97-110 EMA centering."""
    return center * momentum + batch_center * (1.0 - momentum)


# ---------------------------------------------------------------------------
# MaxViT with registers (max_vit_with_registers.py)
# ---------------------------------------------------------------------------


def _register_bias_indices(w: int, r: int) -> np.ndarray:
    """max_vit_with_registers.py:147-159: (r+w^2)^2 index table; all
    register-involving pairs share the extra last table row."""
    pos = np.arange(w)
    gy, gx = np.meshgrid(pos, pos, indexing="ij")
    grid = np.stack([gy, gx], -1).reshape(-1, 2)
    rel = grid[:, None] - grid[None, :] + (w - 1)
    idx = rel[..., 0] * (2 * w - 1) + rel[..., 1]
    n_bias = (2 * w - 1) ** 2
    return np.pad(idx, ((r, 0), (r, 0)),
                  constant_values=n_bias).astype(np.int32)


class _RegisterWindowAttention(nn.Module):
    """max_vit_with_registers.py:116-198 on (B', r + w^2, d) tokens."""

    dim: int
    dim_head: int
    window_size: int
    num_registers: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        h = self.dim // self.dim_head
        y = nn.LayerNorm(name="norm")(x)
        qkv = nn.Dense(self.dim * 3, use_bias=False, name="to_qkv")(y)
        q, k, v = (rearrange(t, "b n (h d) -> b h n d", h=h)
                   for t in jnp.split(qkv, 3, axis=-1))
        sim = jnp.einsum("bhid,bhjd->bhij",
                         q * self.dim_head ** -0.5, k)
        n_bias = (2 * self.window_size - 1) ** 2
        table = self.param("rel_pos_bias", nn.initializers.normal(1.0),
                           (n_bias + 1, h))
        idx = _register_bias_indices(self.window_size, self.num_registers)
        sim = sim + rearrange(table[idx], "i j h -> h i j")
        attn = jax.nn.softmax(sim, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = rearrange(out, "b h n d -> b n (h d)")
        out = nn.Dense(self.dim, use_bias=False, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class MaxViTWithRegisters(nn.Module):
    """max_vit_with_registers.py:200-340: MaxViT whose window attention
    carries per-block register tokens; registers ride block attention
    per window, are mean-pooled across windows, then ride grid
    attention (outside its feed-forward)."""

    num_classes: int
    dim: int
    depth: Sequence[int]
    dim_head: int = 32
    dim_conv_stem: Optional[int] = None
    window_size: int = 7
    mbconv_expansion_rate: float = 4.0
    mbconv_shrinkage_rate: float = 0.25
    dropout: float = 0.1
    num_register_tokens: int = 4

    @nn.compact
    def __call__(self, img: Array, *, train: bool = False) -> Array:
        assert self.num_register_tokens > 0
        stem = self.dim_conv_stem or self.dim
        x = nn.Conv(stem, (3, 3), strides=2, padding=1, name="stem1")(img)
        x = nn.Conv(stem, (3, 3), padding=1, name="stem2")(x)

        w, r = self.window_size, self.num_register_tokens
        dims = tuple(self.dim * 2 ** i for i in range(len(self.depth)))
        for s, (dim, depth) in enumerate(zip(dims, self.depth)):
            for blk in range(depth):
                pre = f"s{s}_b{blk}"
                x = _MBConv(dim, downsample=blk == 0,
                            expansion_rate=self.mbconv_expansion_rate,
                            shrinkage_rate=self.mbconv_shrinkage_rate,
                            name=f"{pre}_mbconv")(x, train=train)
                nx, ny = x.shape[1] // w, x.shape[2] // w
                regs = self.param(f"{pre}_registers",
                                  nn.initializers.normal(1.0),
                                  (r, dim))

                # block-local attention with registers (FF sees them too)
                t = rearrange(x, "b (x w1) (y w2) d -> (b x y) (w1 w2) d",
                              w1=w, w2=w)
                rt = jnp.broadcast_to(regs, (t.shape[0], r, dim))
                t = jnp.concatenate([rt, t], axis=1)
                t = t + _RegisterWindowAttention(
                    dim, self.dim_head, w, r, self.dropout,
                    name=f"{pre}_block_attn")(t, train=train)
                t = t + _TokenFeedForward(dim, dropout=self.dropout,
                                          name=f"{pre}_block_ff")(
                    t, train=train)
                rt, t = t[:, :r], t[:, r:]
                x = rearrange(t, "(b x y) (w1 w2) d -> b (x w1) (y w2) d",
                              x=nx, y=ny, w1=w)
                rt = rearrange(rt, "(b x y) n d -> b (x y) n d", x=nx, y=ny)
                rt = rt.mean(axis=1)                       # (b, r, d)

                # grid-dilated attention; FF runs after register removal
                t = rearrange(x, "b (w1 x) (w2 y) d -> (b x y) (w1 w2) d",
                              w1=w, w2=w)
                rt = repeat(rt, "b n d -> (b x y) n d", x=nx, y=ny)
                t = jnp.concatenate([rt, t], axis=1)
                t = t + _RegisterWindowAttention(
                    dim, self.dim_head, w, r, self.dropout,
                    name=f"{pre}_grid_attn")(t, train=train)
                t = t[:, r:]
                t = t + _TokenFeedForward(dim, dropout=self.dropout,
                                          name=f"{pre}_grid_ff")(
                    t, train=train)
                x = rearrange(t, "(b x y) (w1 w2) d -> b (w1 x) (w2 y) d",
                              x=nx, y=ny, w1=w)

        pooled = nn.LayerNorm(name="head_norm")(x.mean(axis=(1, 2)))
        return nn.Dense(self.num_classes, name="head")(pooled)


# ---------------------------------------------------------------------------
# Extractor / Recorder (extractor.py / recorder.py) -- functional capture
# ---------------------------------------------------------------------------


def _walk(tree, path=()):
    if isinstance(tree, dict):
        for key, val in tree.items():
            yield from _walk(val, path + (key,))
    else:
        yield path, tree


def _path_sort_key(path):
    key = []
    for part in path:
        for piece in re.split(r"(\d+)", part):
            if piece.isdigit():
                key.append((1, int(piece), ""))
            elif piece:
                key.append((0, 0, piece))
    return key


def extract(model: nn.Module, variables, *args,
            layer_name: str = "transformer", **kwargs):
    """extractor.py:18-90 as a function: run the model and also return
    the output of the named submodule (flax capture_intermediates
    replaces the torch forward hook)."""
    flt = lambda mdl, method: mdl.name == layer_name and \
        method == "__call__"
    out, state = model.apply(variables, *args,
                             capture_intermediates=flt,
                             mutable=["intermediates"], **kwargs)
    latents = [val for path, val in _walk(state["intermediates"])
               if len(path) >= 2 and path[-1] == "__call__"
               and path[-2] == layer_name]
    assert latents, f"layer {layer_name!r} not found"
    latent = latents[0]
    if isinstance(latent, tuple) and len(latent) == 1:
        latent = latent[0]
    return out, latent


def record_attention(model: nn.Module, variables, *args, **kwargs):
    """recorder.py:10-59 as a function: returns (output, attns) where
    ``attns`` stacks every sown post-softmax attention map
    (models/vit.py ViTAttention) as (B, layers, heads, N, N)."""
    out, state = model.apply(variables, *args,
                             mutable=["intermediates"], **kwargs)
    maps = [(path, val) for path, val in _walk(state["intermediates"])
            if path[-2] == "attn" or path[-1] == "attn"]
    maps = [(p, v[0] if isinstance(v, tuple) else v) for p, v in maps]
    maps.sort(key=lambda pv: _path_sort_key(pv[0]))
    if not maps:
        return out, None
    return out, jnp.stack([v for _, v in maps], axis=1)
