"""ViT zoo, round 3: the hierarchical / windowed-attention members of
the reference's dormant vit_pytorch_diy collection.

Rebuilt TPU-first from the reference modules' *behavior* (channels-last
(B, H, W, C) feature maps, Dense layers where the reference uses 1x1
convs, einsum attention, position-bias index tables precomputed as
static numpy so every gather is a constant-index lookup under jit):

* ``LeViT`` -- levit.py: 4-conv downsampling stem, attention with
  BatchNorm'd conv projections and a learned absolute-distance position
  bias, hardswish conv FFN, shrinking stages joined by downsampling
  attention (stride-2 queries, doubled heads).
* ``MaxViT`` -- max_vit.py: per-block MBConv (BN + SE + stochastic
  dropsample) followed by block-local then grid-dilated window
  attention, each with a (2w-1)^2 relative-position-bias table.
* ``TwinsSVT`` -- twins_svt.py: four stages of space-to-depth patch
  merging, locally-grouped window attention alternating with
  globally-subsampled attention (k-strided kv), and a depthwise-conv
  PEG between the first and remaining blocks.
* ``XCiT`` -- xcit.py: cross-covariance attention (L2-normalised q/k,
  d x d attention with a learned log-temperature), depthwise local
  patch interaction, LayerScale everywhere, then class-attention
  layers where only the CLS token queries the frozen patch tokens.
* ``CrossFormer`` -- crossformer.py: cross-scale embedding (parallel
  convs of different kernel sizes, channel-split geometrically),
  alternating short-distance (windowed) and long-distance (dilated)
  attention with an MLP dynamic position bias.
* ``RegionViT`` -- regionvit.py: parallel regional + local token
  streams; per layer the SAME attention weights are applied to the
  regional tokens and then to each local window with its region token
  prepended (weight sharing replicated).
* ``ScalableViT`` -- scalable_vit.py: scalable self-attention
  (r-strided kv reduction) and interactive windowed self-attention
  (windowed attention + a parallel 3x3-conv local interactive module
  on v).  The reference's forward unpacks its module list in a
  swapped order so each layer actually runs SSA, FF, [PEG], FF, IWSA;
  that effective order is what is reproduced here
  (scalable_vit.py:217-236).
* ``SepViT`` -- sep_vit.py: depthwise-separable attention: windowed
  attention with a learned window token per window, then a second
  pointwise attention stage where window tokens attend across windows
  and re-mix the per-window value maps.

Excluded reference quirk: RegionViT's ``tokenize_local_3_conv=True``
stem applies ``nn.LayerNorm(dim)`` to NCHW maps, normalising the width
axis (regionvit.py:213-221); only the default single-conv tokenizer is
reproduced.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange, repeat
from flax import linen as nn

Array = jax.Array


def _tuple_of(val, n: int) -> tuple:
    if isinstance(val, (tuple, list)):
        t = tuple(val)
        return t + (t[-1],) * (n - len(t))
    return (val,) * n


def _rel_bias_indices(w: int) -> np.ndarray:
    """(w^2, w^2) indices into a (2w-1)^2 relative-position table
    (max_vit.py:152-158 semantics)."""
    pos = np.arange(w)
    gy, gx = np.meshgrid(pos, pos, indexing="ij")
    grid = np.stack([gy, gx], -1).reshape(-1, 2)
    rel = grid[:, None] - grid[None, :] + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


# ---------------------------------------------------------------------------
# LeViT (levit.py)
# ---------------------------------------------------------------------------


def _levit_pos_indices(fmap: int, downsample: bool) -> np.ndarray:
    """Absolute |Δ| position-bias indices (levit.py:71-83): row index
    over a (fmap^2,) table via |dx|*fmap + |dy|."""
    q_range = np.arange(0, fmap, 2 if downsample else 1)
    k_range = np.arange(fmap)
    qy, qx = np.meshgrid(q_range, q_range, indexing="ij")
    ky, kx = np.meshgrid(k_range, k_range, indexing="ij")
    q_pos = np.stack([qy, qx], -1).reshape(-1, 2)
    k_pos = np.stack([ky, kx], -1).reshape(-1, 2)
    rel = np.abs(q_pos[:, None] - k_pos[None, :])
    return (rel[..., 0] * fmap + rel[..., 1]).astype(np.int32)


class _LeViTAttention(nn.Module):
    """levit.py:40-108: BN'd 1x1-conv projections, learned
    absolute-distance bias added as ``bias / scale``, GELU + 1x1 conv +
    zero-init BN output."""

    fmap_size: int
    heads: int
    dim_key: int
    dim_value: int
    dim_out: int
    downsample: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        h, scale = self.heads, self.dim_key ** -0.5
        stride = 2 if self.downsample else 1
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       name=name)
        q = bn("q_bn")(nn.Dense(self.dim_key * h, use_bias=False,
                                name="to_q")(x[:, ::stride, ::stride]))
        k = bn("k_bn")(nn.Dense(self.dim_key * h, use_bias=False,
                                name="to_k")(x))
        v = bn("v_bn")(nn.Dense(self.dim_value * h, use_bias=False,
                                name="to_v")(x))
        qh = rearrange(q, "b x y (h d) -> b h (x y) d", h=h)
        kh = rearrange(k, "b x y (h d) -> b h (x y) d", h=h)
        vh = rearrange(v, "b x y (h d) -> b h (x y) d", h=h)
        dots = jnp.einsum("bhid,bhjd->bhij", qh, kh) * scale
        table = self.param("pos_bias", nn.initializers.normal(1.0),
                           (self.fmap_size ** 2, h))
        idx = _levit_pos_indices(self.fmap_size, self.downsample)
        dots = dots + rearrange(table[idx], "i j h -> h i j") / scale
        attn = jax.nn.softmax(dots, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhij,bhjd->bhid", attn, vh)
        out = rearrange(out, "b h (x y) d -> b x y (h d)", y=q.shape[2])
        out = nn.Dense(self.dim_out, name="to_out")(nn.gelu(out))
        out = nn.BatchNorm(use_running_average=not train,
                           scale_init=nn.initializers.zeros,
                           name="out_bn")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class _LeViTFeedForward(nn.Module):
    """levit.py:27-38: 1x1 conv -> hardswish -> 1x1 conv."""

    dim: int
    mult: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        y = nn.Dense(self.dim * self.mult, name="fc1")(x)
        y = nn.hard_swish(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(self.dim, name="fc2")(y)
        return nn.Dropout(self.dropout, deterministic=not train)(y)


class LeViT(nn.Module):
    """levit.py:129-195."""

    image_size: int
    num_classes: int
    dim: Union[int, Sequence[int]]
    depth: Union[int, Sequence[int]]
    heads: Union[int, Sequence[int]]
    mlp_mult: int = 2
    stages: int = 3
    dim_key: int = 32
    dim_value: int = 64
    dropout: float = 0.0
    num_distill_classes: Optional[int] = None

    @nn.compact
    def __call__(self, img: Array, *, train: bool = False):
        dims = _tuple_of(self.dim, self.stages)
        depths = _tuple_of(self.depth, self.stages)
        heads = _tuple_of(self.heads, self.stages)

        x = img
        for i, ch in enumerate((32, 64, 128, dims[0])):
            x = nn.Conv(ch, (3, 3), strides=2, padding=1,
                        name=f"stem_{i}")(x)
        fmap = self.image_size // 16

        for s in range(self.stages):
            for d in range(depths[s]):
                y = _LeViTAttention(fmap, heads[s], self.dim_key,
                                    self.dim_value, dims[s],
                                    dropout=self.dropout,
                                    name=f"s{s}_attn{d}")(x, train=train)
                x = x + y
                x = x + _LeViTFeedForward(dims[s], self.mlp_mult,
                                          self.dropout,
                                          name=f"s{s}_ff{d}")(x, train=train)
            if s < self.stages - 1:
                # downsampling transformer: no attention residual
                x = _LeViTAttention(fmap, heads[s] * 2, self.dim_key,
                                    self.dim_value, dims[s + 1],
                                    downsample=True, dropout=self.dropout,
                                    name=f"s{s}_down_attn")(x, train=train)
                fmap = math.ceil(fmap / 2)
                x = x + _LeViTFeedForward(dims[s + 1], self.mlp_mult,
                                          self.dropout,
                                          name=f"s{s}_down_ff")(
                    x, train=train)

        pooled = x.mean(axis=(1, 2))
        out = nn.Dense(self.num_classes, name="mlp_head")(pooled)
        if self.num_distill_classes is not None:
            distill = nn.Dense(self.num_distill_classes,
                               name="distill_head")(pooled)
            return out, distill
        return out


# ---------------------------------------------------------------------------
# MaxViT (max_vit.py)
# ---------------------------------------------------------------------------


class _SqueezeExcite2D(nn.Module):
    """max_vit.py:47-62."""

    shrinkage_rate: float = 0.25

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dim = x.shape[-1]
        g = x.mean(axis=(1, 2))
        g = nn.Dense(int(dim * self.shrinkage_rate), use_bias=False,
                     name="fc1")(g)
        g = nn.Dense(dim, use_bias=False, name="fc2")(nn.silu(g))
        return x * jax.nn.sigmoid(g)[:, None, None, :]


class _MBConv(nn.Module):
    """max_vit.py:90-117: expand 1x1 + BN + GELU, depthwise 3x3
    (stride on downsample) + BN + GELU, SE, project 1x1 + BN; residual
    with per-sample dropsample when shapes match."""

    dim_out: int
    downsample: bool
    expansion_rate: float = 4.0
    shrinkage_rate: float = 0.25
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        hidden = int(self.expansion_rate * self.dim_out)
        stride = 2 if self.downsample else 1
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       name=name)
        y = nn.gelu(bn("bn1")(nn.Dense(hidden, name="expand")(x)))
        y = nn.Conv(hidden, (3, 3), strides=stride, padding=1,
                    feature_group_count=hidden, name="dw")(y)
        y = nn.gelu(bn("bn2")(y))
        y = _SqueezeExcite2D(self.shrinkage_rate, name="se")(y)
        y = bn("bn3")(nn.Dense(self.dim_out, name="project")(y))
        if x.shape[-1] == self.dim_out and not self.downsample:
            if train and self.dropout > 0.0:
                keep = jax.random.uniform(
                    self.make_rng("dropout"),
                    (y.shape[0], 1, 1, 1)) > self.dropout
                y = y * keep / (1.0 - self.dropout)
            y = y + x
        return y


class _WindowAttention(nn.Module):
    """max_vit.py:121-206 on pre-windowed tokens (B', n, d) with a
    (2w-1)^2 learned relative-position-bias table."""

    dim: int
    dim_head: int
    window_size: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        h = self.dim // self.dim_head
        y = nn.LayerNorm(name="norm")(x)
        qkv = nn.Dense(self.dim * 3, use_bias=False, name="to_qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = rearrange(q, "b n (h d) -> b h n d", h=h) * self.dim_head ** -0.5
        k = rearrange(k, "b n (h d) -> b h n d", h=h)
        v = rearrange(v, "b n (h d) -> b h n d", h=h)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k)
        table = self.param("rel_pos_bias", nn.initializers.normal(1.0),
                           ((2 * self.window_size - 1) ** 2, h))
        sim = sim + rearrange(table[_rel_bias_indices(self.window_size)],
                              "i j h -> h i j")
        attn = jax.nn.softmax(sim, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = rearrange(out, "b h n d -> b n (h d)")
        out = nn.Dense(self.dim, use_bias=False, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class _TokenFeedForward(nn.Module):
    """max_vit.py:30-43: LN -> Dense mult -> GELU -> Dense."""

    dim: int
    mult: float = 4.0
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        y = nn.LayerNorm(name="norm")(x)
        y = nn.Dense(int(self.dim * self.mult), name="fc1")(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(nn.gelu(y))
        y = nn.Dense(self.dim, name="fc2")(y)
        return nn.Dropout(self.dropout, deterministic=not train)(y)


class MaxViT(nn.Module):
    """max_vit.py:208-291."""

    num_classes: int
    dim: int
    depth: Sequence[int]
    dim_head: int = 32
    dim_conv_stem: Optional[int] = None
    window_size: int = 7
    mbconv_expansion_rate: float = 4.0
    mbconv_shrinkage_rate: float = 0.25
    dropout: float = 0.1

    @nn.compact
    def __call__(self, img: Array, *, train: bool = False) -> Array:
        stem = self.dim_conv_stem or self.dim
        x = nn.Conv(stem, (3, 3), strides=2, padding=1, name="stem1")(img)
        x = nn.Conv(stem, (3, 3), padding=1, name="stem2")(x)

        w = self.window_size
        dims = tuple(self.dim * 2 ** i for i in range(len(self.depth)))
        for s, (dim, depth) in enumerate(zip(dims, self.depth)):
            for blk in range(depth):
                pre = f"s{s}_b{blk}"
                x = _MBConv(dim, downsample=blk == 0,
                            expansion_rate=self.mbconv_expansion_rate,
                            shrinkage_rate=self.mbconv_shrinkage_rate,
                            name=f"{pre}_mbconv")(x, train=train)
                # block-local attention
                t = rearrange(x, "b (x w1) (y w2) d -> (b x y) (w1 w2) d",
                              w1=w, w2=w)
                t = t + _WindowAttention(dim, self.dim_head, w, self.dropout,
                                         name=f"{pre}_block_attn")(
                    t, train=train)
                t = t + _TokenFeedForward(dim, dropout=self.dropout,
                                          name=f"{pre}_block_ff")(
                    t, train=train)
                x = rearrange(t, "(b x y) (w1 w2) d -> b (x w1) (y w2) d",
                              x=x.shape[1] // w, y=x.shape[2] // w, w1=w)
                # grid-dilated attention
                t = rearrange(x, "b (w1 x) (w2 y) d -> (b x y) (w1 w2) d",
                              w1=w, w2=w)
                t = t + _WindowAttention(dim, self.dim_head, w, self.dropout,
                                         name=f"{pre}_grid_attn")(
                    t, train=train)
                t = t + _TokenFeedForward(dim, dropout=self.dropout,
                                          name=f"{pre}_grid_ff")(
                    t, train=train)
                x = rearrange(t, "(b x y) (w1 w2) d -> b (w1 x) (w2 y) d",
                              x=x.shape[1] // w, y=x.shape[2] // w, w1=w)

        pooled = nn.LayerNorm(name="head_norm")(x.mean(axis=(1, 2)))
        return nn.Dense(self.num_classes, name="head")(pooled)


# ---------------------------------------------------------------------------
# Twins-SVT (twins_svt.py)
# ---------------------------------------------------------------------------


class _ConvFeedForward(nn.Module):
    """twins_svt.py:45-57 (1x1 convs == Dense on channels-last)."""

    dim: int
    mult: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        y = nn.LayerNorm(name="norm")(x)
        y = nn.gelu(nn.Dense(self.dim * self.mult, name="fc1")(y))
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(self.dim, name="fc2")(y)
        return nn.Dropout(self.dropout, deterministic=not train)(y)


class _TwinsLocalAttention(nn.Module):
    """twins_svt.py:85-120: per-window attention, window = patch_size."""

    dim: int
    heads: int
    dim_head: int
    patch_size: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        p, h = self.patch_size, self.heads
        inner = self.heads * self.dim_head
        y = nn.LayerNorm(name="norm")(x)
        win = rearrange(y, "b (x p1) (y p2) c -> (b x y) (p1 p2) c",
                        p1=p, p2=p)
        q = nn.Dense(inner, use_bias=False, name="to_q")(win)
        kv = nn.Dense(inner * 2, use_bias=False, name="to_kv")(win)
        k, v = jnp.split(kv, 2, axis=-1)
        q = rearrange(q, "b n (h d) -> b h n d", h=h) * self.dim_head ** -0.5
        k = rearrange(k, "b n (h d) -> b h n d", h=h)
        v = rearrange(v, "b n (h d) -> b h n d", h=h)
        attn = jax.nn.softmax(jnp.einsum("bhid,bhjd->bhij", q, k), axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = rearrange(out, "(b x y) h (p1 p2) d -> b (x p1) (y p2) (h d)",
                        x=x.shape[1] // p, y=x.shape[2] // p, p1=p)
        out = nn.Dense(self.dim, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class _TwinsGlobalAttention(nn.Module):
    """twins_svt.py:122-157: full queries over k-strided kv."""

    dim: int
    heads: int
    dim_head: int
    k: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        h = self.heads
        inner = self.heads * self.dim_head
        y = nn.LayerNorm(name="norm")(x)
        q = nn.Dense(inner, use_bias=False, name="to_q")(y)
        kv = nn.Conv(inner * 2, (self.k, self.k), strides=self.k,
                     padding="VALID", use_bias=False, name="to_kv")(y)
        k, v = jnp.split(kv, 2, axis=-1)
        q = rearrange(q, "b x y (h d) -> b h (x y) d",
                      h=h) * self.dim_head ** -0.5
        k = rearrange(k, "b x y (h d) -> b h (x y) d", h=h)
        v = rearrange(v, "b x y (h d) -> b h (x y) d", h=h)
        attn = jax.nn.softmax(jnp.einsum("bhid,bhjd->bhij", q, k), axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = rearrange(out, "b h (x y) d -> b x y (h d)", x=x.shape[1])
        out = nn.Dense(self.dim, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class _PEG(nn.Module):
    """Positional encoding generator: residual depthwise conv
    (twins_svt.py:77-83)."""

    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dim = x.shape[-1]
        return x + nn.Conv(dim, (self.kernel_size, self.kernel_size),
                           padding=self.kernel_size // 2,
                           feature_group_count=dim, name="proj")(x)


class _TwinsBlock(nn.Module):
    """One [local+ff, global+ff] transformer layer group
    (twins_svt.py:159-176)."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_mult: int
    local_patch_size: int
    global_k: int
    dropout: float
    has_local: bool

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        for i in range(self.depth):
            if self.has_local:
                x = x + _TwinsLocalAttention(
                    self.dim, self.heads, self.dim_head,
                    self.local_patch_size, self.dropout,
                    name=f"l{i}_local")(x, train=train)
                x = x + _ConvFeedForward(self.dim, self.mlp_mult,
                                         self.dropout,
                                         name=f"l{i}_ff1")(x, train=train)
            x = x + _TwinsGlobalAttention(self.dim, self.heads,
                                          self.dim_head, self.global_k,
                                          self.dropout,
                                          name=f"l{i}_global")(x, train=train)
            x = x + _ConvFeedForward(self.dim, self.mlp_mult, self.dropout,
                                     name=f"l{i}_ff2")(x, train=train)
        return x


class TwinsSVT(nn.Module):
    """twins_svt.py:178-235.  Per-stage (emb_dim, patch_size,
    local_patch_size, global_k, depth) follow the reference defaults."""

    num_classes: int
    embed_dims: Sequence[int] = (64, 128, 256, 512)
    patch_sizes: Sequence[int] = (4, 2, 2, 2)
    local_patch_sizes: Sequence[int] = (7, 7, 7, 7)
    global_ks: Sequence[int] = (7, 7, 7, 7)
    depths: Sequence[int] = (1, 1, 5, 4)
    peg_kernel_size: int = 3
    heads: int = 8
    dim_head: int = 64
    mlp_mult: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, img: Array, *, train: bool = False) -> Array:
        x = img
        n_stages = len(self.embed_dims)
        for s in range(n_stages):
            dim, p = self.embed_dims[s], self.patch_sizes[s]
            is_last = s == n_stages - 1
            x = rearrange(x, "b (h p1) (w p2) c -> b h w (c p1 p2)",
                          p1=p, p2=p)
            x = nn.LayerNorm(name=f"s{s}_pe_norm1")(x)
            x = nn.Dense(dim, name=f"s{s}_pe_proj")(x)
            x = nn.LayerNorm(name=f"s{s}_pe_norm2")(x)
            x = _TwinsBlock(dim, 1, self.heads, self.dim_head, self.mlp_mult,
                            self.local_patch_sizes[s], self.global_ks[s],
                            self.dropout, not is_last,
                            name=f"s{s}_pre")(x, train=train)
            x = _PEG(self.peg_kernel_size, name=f"s{s}_peg")(x)
            x = _TwinsBlock(dim, self.depths[s], self.heads, self.dim_head,
                            self.mlp_mult, self.local_patch_sizes[s],
                            self.global_ks[s], self.dropout, not is_last,
                            name=f"s{s}_main")(x, train=train)
        return nn.Dense(self.num_classes, name="head")(x.mean(axis=(1, 2)))


# ---------------------------------------------------------------------------
# XCiT (xcit.py)
# ---------------------------------------------------------------------------


def _layer_scale_init(layer: int) -> float:
    """xcit.py:42-50 effective behavior: 0.1 for layer <= 18 else 1e-6
    (the reference's chained comparison for the 1e-5 branch can never
    be true)."""
    return 0.1 if layer <= 18 else 1e-6


class _LayerScaled(nn.Module):
    """Multiply a sub-module's output by a learned per-dim scale."""

    dim: int
    init_eps: float

    @nn.compact
    def __call__(self, y: Array) -> Array:
        s = self.param("scale",
                       lambda _, shape: jnp.full(shape, self.init_eps),
                       (self.dim,))
        return y * s


class _XCAttention(nn.Module):
    """xcit.py:109-148: d x d cross-covariance attention with
    L2-normalised q/k and a learned per-head temperature."""

    dim: int
    heads: int
    dim_head: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        h = self.heads
        inner = h * self.dim_head
        lead = x.shape[:-1]
        t = x.reshape(x.shape[0], -1, x.shape[-1])
        t = nn.LayerNorm(name="norm")(t)
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(t)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = rearrange(q, "b n (h d) -> b h d n", h=h)
        k = rearrange(k, "b n (h d) -> b h d n", h=h)
        v = rearrange(v, "b n (h d) -> b h d n", h=h)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True),
                            1e-12)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True),
                            1e-12)
        temp = self.param("temperature", nn.initializers.zeros, (h, 1, 1))
        sim = jnp.einsum("bhin,bhjn->bhij", q, k) * jnp.exp(temp)
        attn = jax.nn.softmax(sim, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhij,bhjn->bhin", attn, v)
        out = rearrange(out, "b h d n -> b n (h d)")
        out = nn.Dense(self.dim, name="to_out")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out.reshape(*lead, self.dim)


class _LocalPatchInteraction(nn.Module):
    """xcit.py:150-167: LN -> dw conv -> BN -> GELU -> dw conv."""

    dim: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        pad = self.kernel_size // 2
        y = nn.LayerNorm(name="norm")(x)
        y = nn.Conv(self.dim, (self.kernel_size, self.kernel_size),
                    padding=pad, feature_group_count=self.dim,
                    name="conv1")(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn")(y)
        y = nn.Conv(self.dim, (self.kernel_size, self.kernel_size),
                    padding=pad, feature_group_count=self.dim,
                    name="conv2")(nn.gelu(y))
        return y


class _ContextAttention(nn.Module):
    """xcit.py:72-107: standard attention; kv over cat(x, context)."""

    dim: int
    heads: int
    dim_head: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None, *,
                 train: bool = False) -> Array:
        h = self.heads
        inner = h * self.dim_head
        y = nn.LayerNorm(name="norm")(x)
        ctx = y if context is None else jnp.concatenate([y, context], axis=1)
        q = nn.Dense(inner, use_bias=False, name="to_q")(y)
        kv = nn.Dense(inner * 2, use_bias=False, name="to_kv")(ctx)
        k, v = jnp.split(kv, 2, axis=-1)
        q = rearrange(q, "b n (h d) -> b h n d", h=h)
        k = rearrange(k, "b n (h d) -> b h n d", h=h)
        v = rearrange(v, "b n (h d) -> b h n d", h=h)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k) * self.dim_head ** -0.5
        attn = jax.nn.softmax(sim, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = rearrange(out, "b h n d -> b n (h d)")
        out = nn.Dense(self.dim, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class XCiT(nn.Module):
    """xcit.py:215-283.  ``layer_dropout`` (whole-layer drop) is not
    reproduced -- the reference default is 0 and dropping layers at
    trace time is incompatible with a single compiled train step."""

    image_size: int
    patch_size: int
    num_classes: int
    dim: int
    depth: int
    cls_depth: int
    heads: int
    mlp_dim: int
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    local_patch_kernel_size: int = 3

    @nn.compact
    def __call__(self, img: Array, *, train: bool = False) -> Array:
        p = self.patch_size
        x = rearrange(img, "b (h p1) (w p2) c -> b h w (p1 p2 c)",
                      p1=p, p2=p)
        x = nn.LayerNorm(name="patch_norm1")(x)
        x = nn.Dense(self.dim, name="patch_embed")(x)
        x = nn.LayerNorm(name="patch_norm2")(x)
        b, gh, gw, _ = x.shape
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, gh * gw, self.dim))
        x = x + pos.reshape(1, gh, gw, self.dim)
        x = nn.Dropout(self.emb_dropout, deterministic=not train)(x)

        for i in range(self.depth):
            eps = _layer_scale_init(i + 1)
            xa = _XCAttention(self.dim, self.heads, self.dim_head,
                              self.dropout, name=f"l{i}_xca")(x, train=train)
            x = x + _LayerScaled(self.dim, eps, name=f"l{i}_xca_scale"
                                 )(xa)
            lp = _LocalPatchInteraction(self.dim,
                                        self.local_patch_kernel_size,
                                        name=f"l{i}_lpi")(x, train=train)
            x = x + _LayerScaled(self.dim, eps, name=f"l{i}_lpi_scale"
                                 )(lp)
            ff = _TokenFeedForward(self.dim, self.mlp_dim / self.dim,
                                   self.dropout, name=f"l{i}_ff")(
                x, train=train)
            x = x + _LayerScaled(self.dim, eps, name=f"l{i}_ff_scale"
                                 )(ff)

        x = nn.LayerNorm(name="final_norm")(x)
        tokens = x.reshape(b, gh * gw, self.dim)
        cls = repeat(self.param("cls_token", nn.initializers.normal(1.0),
                                (self.dim,)), "d -> b 1 d", b=b)
        for i in range(self.cls_depth):
            eps = _layer_scale_init(i + 1)
            ca = _ContextAttention(self.dim, self.heads, self.dim_head,
                                   self.dropout, name=f"cls{i}_attn")(
                cls, tokens, train=train)
            cls = cls + _LayerScaled(self.dim, eps, name=f"cls{i}_attn_scale"
                                     )(ca)
            ff = _TokenFeedForward(self.dim, self.mlp_dim / self.dim,
                                   self.dropout, name=f"cls{i}_ff")(
                cls, train=train)
            cls = cls + _LayerScaled(self.dim, eps, name=f"cls{i}_ff_scale"
                                     )(ff)

        out = nn.LayerNorm(name="head_norm")(cls[:, 0])
        return nn.Dense(self.num_classes, name="head")(out)


# ---------------------------------------------------------------------------
# CrossFormer (crossformer.py)
# ---------------------------------------------------------------------------


class _CrossEmbed(nn.Module):
    """crossformer.py:14-36: parallel convs at several kernel sizes,
    output channels split geometrically, concatenated."""

    dim_out: int
    kernel_sizes: Sequence[int]
    stride: int = 2

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kernels = sorted(self.kernel_sizes)
        scales = [self.dim_out // 2 ** i for i in range(1, len(kernels))]
        scales = [*scales, self.dim_out - sum(scales)]
        outs = []
        for i, (k, d) in enumerate(zip(kernels, scales)):
            outs.append(nn.Conv(d, (k, k), strides=self.stride,
                                padding=(k - self.stride) // 2,
                                name=f"conv{i}")(x))
        return jnp.concatenate(outs, axis=-1)


class _DynamicPositionBias(nn.Module):
    """crossformer.py:40-53: MLP coords(2) -> scalar bias."""

    dim: int

    @nn.compact
    def __call__(self, coords: Array) -> Array:
        y = coords
        for i in range(3):
            y = nn.Dense(self.dim, name=f"fc{i}")(y)
            y = nn.relu(nn.LayerNorm(name=f"norm{i}")(y))
        return nn.Dense(1, name="out")(y)[..., 0]


def _crossformer_bias_tables(w: int) -> Tuple[np.ndarray, np.ndarray]:
    """Replicates the reference's coordinate table and index math
    exactly (crossformer.py:110-117,146-150): the coordinate table is
    built over (-w..w) with stride 2w+1 while the indices use stride
    2w-1 -- an injective (if scrambled) coord assignment that is part
    of the trained function."""
    pos = np.arange(-w, w + 1)
    gy, gx = np.meshgrid(pos, pos, indexing="ij")
    coords = np.stack([gy, gx], -1).reshape(-1, 2).astype(np.float32)
    grid = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"),
                    0).reshape(2, -1)
    rel = grid[:, :, None] - grid[:, None, :] + (w - 1)
    idx = (rel * np.array([2 * w - 1, 1])[:, None, None]).sum(0)
    return coords, idx.astype(np.int32)


class _CrossFormerAttention(nn.Module):
    """crossformer.py:78-172: short (windowed) or long (dilated grid)
    attention with dynamic position bias."""

    dim: int
    attn_type: str          # 'short' | 'long'
    window_size: int
    dim_head: int = 32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        assert self.attn_type in ("short", "long")
        heads = self.dim // self.dim_head
        inner = heads * self.dim_head
        wsz = self.window_size
        height, width = x.shape[1], x.shape[2]

        y = nn.LayerNorm(name="norm")(x)
        if self.attn_type == "short":
            y = rearrange(y, "b (h s1) (w s2) d -> (b h w) s1 s2 d",
                          s1=wsz, s2=wsz)
        else:
            y = rearrange(y, "b (l1 h) (l2 w) d -> (b h w) l1 l2 d",
                          l1=wsz, l2=wsz)
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = rearrange(q, "b x y (h d) -> b h (x y) d",
                      h=heads) * self.dim_head ** -0.5
        k = rearrange(k, "b x y (h d) -> b h (x y) d", h=heads)
        v = rearrange(v, "b x y (h d) -> b h (x y) d", h=heads)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k)

        coords, idx = _crossformer_bias_tables(wsz)
        biases = _DynamicPositionBias(self.dim // 4, name="dpb")(
            jnp.asarray(coords))
        sim = sim + biases[idx]

        attn = jax.nn.softmax(sim, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = rearrange(out, "b h (x y) d -> b x y (h d)", x=wsz)
        out = nn.Dense(self.dim, name="to_out")(out)
        if self.attn_type == "short":
            out = rearrange(out, "(b h w) s1 s2 d -> b (h s1) (w s2) d",
                            h=height // wsz, w=width // wsz)
        else:
            out = rearrange(out, "(b h w) l1 l2 d -> b (l1 h) (l2 w) d",
                            h=height // wsz, w=width // wsz)
        return out


class _CrossFormerFF(nn.Module):
    """crossformer.py:69-76 (no dropout after the second conv)."""

    dim: int
    mult: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        y = nn.LayerNorm(name="norm")(x)
        y = nn.gelu(nn.Dense(self.dim * self.mult, name="fc1")(y))
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return nn.Dense(self.dim, name="fc2")(y)


class CrossFormer(nn.Module):
    """crossformer.py:208-267."""

    num_classes: int
    dim: Sequence[int] = (64, 128, 256, 512)
    depth: Sequence[int] = (2, 2, 8, 2)
    global_window_size: Sequence[int] = (8, 4, 2, 1)
    local_window_size: Union[int, Sequence[int]] = 7
    cross_embed_kernel_sizes: Sequence[Sequence[int]] = (
        (4, 8, 16, 32), (2, 4), (2, 4), (2, 4))
    cross_embed_strides: Sequence[int] = (4, 2, 2, 2)
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0

    @nn.compact
    def __call__(self, img: Array, *, train: bool = False) -> Array:
        local_ws = _tuple_of(self.local_window_size, 4)
        x = img
        for s in range(4):
            dim = self.dim[s]
            x = _CrossEmbed(dim, self.cross_embed_kernel_sizes[s],
                            self.cross_embed_strides[s],
                            name=f"s{s}_cel")(x)
            for l in range(self.depth[s]):
                x = x + _CrossFormerAttention(
                    dim, "short", local_ws[s], dropout=self.attn_dropout,
                    name=f"s{s}_l{l}_short")(x, train=train)
                x = x + _CrossFormerFF(dim, dropout=self.ff_dropout,
                                       name=f"s{s}_l{l}_sff")(x, train=train)
                x = x + _CrossFormerAttention(
                    dim, "long", self.global_window_size[s],
                    dropout=self.attn_dropout,
                    name=f"s{s}_l{l}_long")(x, train=train)
                x = x + _CrossFormerFF(dim, dropout=self.ff_dropout,
                                       name=f"s{s}_l{l}_lff")(x, train=train)
        return nn.Dense(self.num_classes, name="head")(x.mean(axis=(1, 2)))


# ---------------------------------------------------------------------------
# RegionViT (regionvit.py)
# ---------------------------------------------------------------------------


class _BiasAttention(nn.Module):
    """regionvit.py:50-100: pre-LN attention with optional additive
    relative-position bias.  One instance serves BOTH the regional
    self-attention and the joint region+local attention of a layer --
    the reference shares the weights (regionvit.py:152-164)."""

    dim: int
    heads: int
    dim_head: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, rel_pos_bias: Optional[Array] = None, *,
                 train: bool = False) -> Array:
        h = self.heads
        inner = h * self.dim_head
        y = nn.LayerNorm(name="norm")(x)
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = rearrange(q, "b n (h d) -> b h n d", h=h) * self.dim_head ** -0.5
        k = rearrange(k, "b n (h d) -> b h n d", h=h)
        v = rearrange(v, "b n (h d) -> b h n d", h=h)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k)
        if rel_pos_bias is not None:
            sim = sim + rel_pos_bias
        attn = jax.nn.softmax(sim, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = rearrange(out, "b h n d -> b n (h d)")
        out = nn.Dense(self.dim, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


def _region_local_bias_indices(wh: int, ww: int, w: int) -> np.ndarray:
    """regionvit.py:136-148: window-local relative bias indices into a
    (2w-1)^2 table (w = configured window size)."""
    gy, gx = np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")
    grid = np.stack([gy.reshape(-1), gx.reshape(-1)])
    rel = grid[:, :, None] - grid[:, None, :] + (w - 1)
    return (rel[0] + rel[1] * (2 * w - 1)).astype(np.int32)


class _R2LTransformer(nn.Module):
    """regionvit.py:102-178."""

    dim: int
    depth: int
    window_size: int
    heads: int = 4
    dim_head: int = 32
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0

    @nn.compact
    def __call__(self, local_tokens: Array, region_tokens: Array, *,
                 train: bool = False):
        b, lh, lw, d = local_tokens.shape
        rh, rw = region_tokens.shape[1], region_tokens.shape[2]
        wh, ww = lh // rh, lw // rw

        table = self.param("local_rel_pos_bias",
                           nn.initializers.normal(1.0),
                           ((2 * self.window_size - 1) ** 2, self.heads))
        idx = _region_local_bias_indices(wh, ww, self.window_size)
        bias = rearrange(table[idx], "i j h -> 1 h i j")
        bias = jnp.pad(bias, ((0, 0), (0, 0), (1, 0), (1, 0)))

        region = region_tokens.reshape(b, rh * rw, d)
        local = local_tokens
        for i in range(self.depth):
            attn = _BiasAttention(self.dim, self.heads, self.dim_head,
                                  self.attn_dropout, name=f"l{i}_attn")
            region = attn(region, train=train) + region
            win = rearrange(local, "b (h p1) (w p2) d -> (b h w) (p1 p2) d",
                            p1=wh, p2=ww)
            reg = rearrange(region, "b n d -> (b n) 1 d")
            joint = jnp.concatenate([reg, win], axis=1)
            joint = attn(joint, bias, train=train) + joint
            joint = joint + _TokenFeedForward(
                self.dim, 4, self.ff_dropout, name=f"l{i}_ff")(
                joint, train=train)
            reg, win = joint[:, :1], joint[:, 1:]
            local = rearrange(win, "(b h w) (p1 p2) d -> b (h p1) (w p2) d",
                              h=lh // wh, w=lw // ww, p1=wh)
            region = rearrange(reg, "(b n) 1 d -> b n d", n=rh * rw)
        return local, region.reshape(b, rh, rw, d)


class RegionViT(nn.Module):
    """regionvit.py:182-269 (default single-conv local tokenizer)."""

    num_classes: int
    dim: Sequence[int] = (64, 128, 256, 512)
    depth: Sequence[int] = (2, 2, 8, 2)
    window_size: int = 7
    local_patch_size: int = 4
    use_peg: bool = False
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0

    @nn.compact
    def __call__(self, img: Array, *, train: bool = False) -> Array:
        region_patch = self.local_patch_size * self.window_size
        assert img.shape[1] % region_patch == 0 and \
            img.shape[2] % region_patch == 0, \
            "image size must be divisible by local_patch_size * window_size"

        local = nn.Conv(self.dim[0], (8, 8), strides=4, padding=3,
                        name="local_encoder")(img)
        reg = rearrange(img, "b (h p1) (w p2) c -> b h w (c p1 p2)",
                        p1=region_patch, p2=region_patch)
        region = nn.Dense(self.dim[0], name="region_encoder")(reg)

        for s in range(4):
            if s > 0:
                # one conv instance serves both streams -- the reference
                # shares the Downsample weights (regionvit.py:264-265)
                down = nn.Conv(self.dim[s], (3, 3), strides=2, padding=1,
                               name=f"s{s}_down")
                local, region = down(local), down(region)
                if self.use_peg:
                    local = _PEG(name=f"s{s}_peg")(local)
            local, region = _R2LTransformer(
                self.dim[s], self.depth[s], self.window_size,
                attn_dropout=self.attn_dropout, ff_dropout=self.ff_dropout,
                name=f"s{s}_r2l")(local, region, train=train)

        pooled = nn.LayerNorm(name="head_norm")(region.mean(axis=(1, 2)))
        return nn.Dense(self.num_classes, name="head")(pooled)


# ---------------------------------------------------------------------------
# ScalableViT (scalable_vit.py)
# ---------------------------------------------------------------------------


class _ScalableSelfAttention(nn.Module):
    """scalable_vit.py:71-124: kv reduced by an r-strided conv."""

    dim: int
    heads: int
    dim_key: int
    dim_value: int
    reduction_factor: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        h, r = self.heads, self.reduction_factor
        y = nn.LayerNorm(name="norm")(x)
        q = nn.Dense(self.dim_key * h, use_bias=False, name="to_q")(y)
        k = nn.Conv(self.dim_key * h, (r, r), strides=r, padding="VALID",
                    use_bias=False, name="to_k")(y)
        v = nn.Conv(self.dim_value * h, (r, r), strides=r, padding="VALID",
                    use_bias=False, name="to_v")(y)
        q = rearrange(q, "b x y (h d) -> b h (x y) d",
                      h=h) * self.dim_key ** -0.5
        k = rearrange(k, "b x y (h d) -> b h (x y) d", h=h)
        v = rearrange(v, "b x y (h d) -> b h (x y) d", h=h)
        attn = jax.nn.softmax(jnp.einsum("bhid,bhjd->bhij", q, k), axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = rearrange(out, "b h (x y) d -> b x y (h d)", x=x.shape[1])
        out = nn.Dense(self.dim, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class _InteractiveWindowedSelfAttention(nn.Module):
    """scalable_vit.py:126-194: windowed attention plus a parallel 3x3
    local interactive module on v."""

    dim: int
    heads: int
    dim_key: int
    dim_value: int
    window_size: Optional[int]
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        h = self.heads
        height, width = x.shape[1], x.shape[2]
        wh = self.window_size or height
        ww = self.window_size or width
        y = nn.LayerNorm(name="norm")(x)
        q = nn.Dense(self.dim_key * h, use_bias=False, name="to_q")(y)
        k = nn.Dense(self.dim_key * h, use_bias=False, name="to_k")(y)
        v = nn.Dense(self.dim_value * h, use_bias=False, name="to_v")(y)
        local_out = nn.Conv(self.dim_value * h, (3, 3), padding=1,
                            name="lim")(v)
        part = lambda t: rearrange(
            t, "b (x w1) (y w2) (h d) -> (b x y) h (w1 w2) d",
            h=h, w1=wh, w2=ww)
        qh, kh, vh = part(q) * self.dim_key ** -0.5, part(k), part(v)
        attn = jax.nn.softmax(jnp.einsum("bhid,bhjd->bhij", qh, kh), axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhij,bhjd->bhid", attn, vh)
        out = rearrange(out, "(b x y) h (w1 w2) d -> b (x w1) (y w2) (h d)",
                        x=height // wh, y=width // ww, w1=wh, w2=ww)
        out = out + local_out
        out = nn.Dense(self.dim, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class ScalableViT(nn.Module):
    """scalable_vit.py:240-304.  Layer op order follows the
    reference's EFFECTIVE forward (SSA, FF, [PEG], FF, IWSA) -- see
    module docstring."""

    num_classes: int
    dim: int
    depth: Sequence[int]
    heads: Union[int, Sequence[int]]
    reduction_factor: Union[int, Sequence[int]]
    window_size: Union[None, int, Sequence[Optional[int]]] = None
    iwsa_dim_key: int = 32
    iwsa_dim_value: int = 32
    ssa_dim_key: int = 32
    ssa_dim_value: int = 32
    ff_expansion_factor: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, img: Array, *, train: bool = False) -> Array:
        n = len(self.depth)
        heads = _tuple_of(self.heads, n)
        rf = _tuple_of(self.reduction_factor, n)
        wsz = self.window_size if isinstance(self.window_size,
                                             (tuple, list)) \
            else (self.window_size,) * n
        dims = tuple(self.dim * 2 ** i for i in range(n))

        x = nn.Conv(self.dim, (7, 7), strides=4, padding=3,
                    name="to_patches")(img)
        for s in range(n):
            dim = dims[s]
            is_last = s == n - 1
            for l in range(self.depth[s]):
                pre = f"s{s}_l{l}"
                x = x + _ScalableSelfAttention(
                    dim, heads[s], self.ssa_dim_key, self.ssa_dim_value,
                    rf[s], self.dropout, name=f"{pre}_ssa")(x, train=train)
                x = x + _ConvFeedForward(dim, self.ff_expansion_factor,
                                         self.dropout,
                                         name=f"{pre}_ff1")(x, train=train)
                if l == 0:
                    x = _PEG(name=f"{pre}_peg")(x)
                x = x + _ConvFeedForward(dim, self.ff_expansion_factor,
                                         self.dropout,
                                         name=f"{pre}_ff2")(x, train=train)
                x = x + _InteractiveWindowedSelfAttention(
                    dim, heads[s], self.iwsa_dim_key, self.iwsa_dim_value,
                    wsz[s], self.dropout, name=f"{pre}_iwsa")(x, train=train)
            if not is_last:
                x = nn.LayerNorm(name=f"s{s}_out_norm")(x)
                x = nn.Conv(dim * 2, (3, 3), strides=2, padding=1,
                            name=f"s{s}_down")(x)

        pooled = nn.LayerNorm(name="head_norm")(x.mean(axis=(1, 2)))
        return nn.Dense(self.num_classes, name="head")(pooled)


# ---------------------------------------------------------------------------
# SepViT (sep_vit.py)
# ---------------------------------------------------------------------------


class _DSSA(nn.Module):
    """sep_vit.py:65-206: windowed attention with a learned window
    token, then pointwise attention of window tokens across windows
    re-mixing the per-window value maps."""

    dim: int
    heads: int
    dim_head: int
    window_size: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        h, wsz = self.heads, self.window_size
        inner = h * self.dim_head
        b, height, width, _ = x.shape
        assert height % wsz == 0 and width % wsz == 0
        nx, ny = height // wsz, width // wsz
        num_windows = nx * ny

        y = nn.LayerNorm(name="norm")(x)
        win = rearrange(y, "b (x w1) (y w2) d -> (b x y) (w1 w2) d",
                        w1=wsz, w2=wsz)
        wtok = repeat(self.param("window_token",
                                 nn.initializers.normal(1.0), (self.dim,)),
                      "d -> b 1 d", b=win.shape[0])
        win = jnp.concatenate([wtok, win], axis=1)
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(win)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = rearrange(q, "b n (h d) -> b h n d", h=h) * self.dim_head ** -0.5
        k = rearrange(k, "b n (h d) -> b h n d", h=h)
        v = rearrange(v, "b n (h d) -> b h n d", h=h)
        attn = jax.nn.softmax(jnp.einsum("bhid,bhjd->bhij", q, k), axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        window_tokens, fmaps = out[:, :, 0], out[:, :, 1:]

        if num_windows > 1:
            window_tokens = rearrange(window_tokens, "(b x y) h d -> "
                                      "b h (x y) d", x=nx, y=ny)
            fmaps = rearrange(fmaps, "(b x y) h n d -> b h (x y) n d",
                              x=nx, y=ny)
            wt = nn.gelu(nn.LayerNorm(name="wt_norm")(window_tokens))
            wt = rearrange(wt, "b h n d -> b n (h d)")
            wqk = nn.Dense(inner * 2, name="wt_to_qk")(wt)
            wqk = rearrange(wqk, "b n (h d) -> b h n d", h=h)
            w_q, w_k = jnp.split(wqk, 2, axis=-1)
            w_attn = jax.nn.softmax(
                jnp.einsum("bhid,bhjd->bhij", w_q * self.dim_head ** -0.5,
                           w_k), axis=-1)
            w_attn = nn.Dropout(self.dropout,
                                deterministic=not train)(w_attn)
            fmaps = jnp.einsum("bhij,bhjnd->bhind", w_attn, fmaps)
            fmap = rearrange(fmaps, "b h (x y) (w1 w2) d -> "
                             "b (x w1) (y w2) (h d)",
                             x=nx, y=ny, w1=wsz, w2=wsz)
        else:
            fmap = rearrange(fmaps, "(b x y) h (w1 w2) d -> "
                             "b (x w1) (y w2) (h d)",
                             x=nx, y=ny, w1=wsz, w2=wsz)
        fmap = nn.Dense(self.dim, name="to_out")(fmap)
        return nn.Dropout(self.dropout, deterministic=not train)(fmap)


class SepViT(nn.Module):
    """sep_vit.py:237-291."""

    num_classes: int
    dim: int
    depth: Sequence[int]
    heads: Union[int, Sequence[int]]
    window_size: Union[int, Sequence[int]] = 7
    dim_head: int = 32
    ff_mult: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, img: Array, *, train: bool = False) -> Array:
        n = len(self.depth)
        heads = _tuple_of(self.heads, n)
        wsz = _tuple_of(self.window_size, n)
        dims = tuple(self.dim * 2 ** i for i in range(n))
        strides = (4,) + (2,) * (n - 1)

        x = img
        for s in range(n):
            dim, stride = dims[s], strides[s]
            ksize = stride * 2 - 1
            is_last = s == n - 1
            x = nn.Conv(dim, (ksize, ksize), strides=stride,
                        padding=ksize // 2, name=f"s{s}_ope")(x)
            x = _PEG(name=f"s{s}_peg")(x)
            for l in range(self.depth[s]):
                x = x + _DSSA(dim, heads[s], self.dim_head, wsz[s],
                              self.dropout,
                              name=f"s{s}_l{l}_dssa")(x, train=train)
                x = x + _ConvFeedForward(dim, self.ff_mult, self.dropout,
                                         name=f"s{s}_l{l}_ff")(
                    x, train=train)
            if not is_last:
                x = nn.LayerNorm(name=f"s{s}_out_norm")(x)

        pooled = nn.LayerNorm(name="head_norm")(x.mean(axis=(1, 2)))
        return nn.Dense(self.num_classes, name="head")(pooled)
