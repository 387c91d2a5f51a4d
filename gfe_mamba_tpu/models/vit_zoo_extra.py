"""ViT zoo, round 2: the dormant vit_pytorch_diy variants most relevant
to volumetric medical work plus two popular 2D members.

Rebuilt TPU-first (channels-last, einsum attention, static shapes) from
the reference's behavior -- NOT ports:

* ``SimpleViT3D`` -- simple_vit_3d.py: cubic patches, fixed 3D sincos
  position embedding, mean pool, linear head (no CLS, no dropout).
* ``ViViT`` -- vivit.py: factorized spatio-temporal attention: tubelet
  embedding, per-frame spatial transformer, then temporal transformer;
  'cls' (two-level CLS tokens) or 'mean' pooling.
* ``CCT`` / ``CCT3D`` -- cct.py / cct_3d.py: compact convolutional
  tokenizer (conv(+ReLU)+maxpool stack) + transformer with stochastic
  depth and attention sequence-pooling instead of a CLS token.
* ``CaiT`` -- cait.py: patch self-attention stack with talking-heads +
  LayerScale, then class-attention stages where only the CLS token
  attends over frozen patch tokens.
* ``DeepViT`` -- deepvit.py: re-attention (a learned head-mixing matrix
  applied to the attention maps before the value product).
* ``PiT`` -- pit.py: overlapping-unfold patch embedding, transformer
  stages separated by depthwise-conv spatial pooling (dim doubles).
* ``T2TViT`` -- t2t.py: progressive tokens-to-token soft splits with
  1-head transformers between, then a standard CLS backbone.
* ``CrossViT`` -- cross_vit.py: dual-branch small/large-patch ViTs
  exchanging CLS tokens through projected cross-attention; summed
  per-branch heads.
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


def _posemb_sincos_3d(f: int, h: int, w: int, dim: int,
                      temperature: float = 10000.0) -> np.ndarray:
    """Fixed 3D sincos embedding (simple_vit_3d.py:13-34): dim//6
    frequencies per axis, concat (x.sin x.cos y.sin y.cos z.sin z.cos),
    zero-padded when dim is not divisible by 6."""
    zs, ys, xs = np.meshgrid(np.arange(f), np.arange(h), np.arange(w),
                             indexing="ij")
    fdim = dim // 6
    omega = 1.0 / temperature ** (np.arange(fdim) / max(fdim - 1, 1))
    out = []
    for grid in (xs, ys, zs):
        arg = grid.reshape(-1)[:, None] * omega[None, :]
        out += [np.sin(arg), np.cos(arg)]
    pe = np.concatenate(out, axis=1).astype(np.float32)
    if pe.shape[1] < dim:
        pe = np.pad(pe, ((0, 0), (0, dim - pe.shape[1])))
    return pe


class SimpleViT3D(nn.Module):
    """simple_vit_3d.py: patchify -> LN/Linear/LN -> +sincos ->
    transformer -> mean pool -> LN -> linear head."""

    image_size: Sequence[int]        # (frames, height, width)
    patch_size: Sequence[int]        # (pf, ph, pw)
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    dim_head: int = 64

    @nn.compact
    def __call__(self, vol: Array, *, deterministic: bool = True) -> Array:
        pf, ph, pw = self.patch_size
        x = rearrange(vol, "b (f pf) (h p1) (w p2) c -> b (f h w) "
                      "(pf p1 p2 c)", pf=pf, p1=ph, p2=pw)
        x = nn.LayerNorm(name="patch_norm1")(x)
        x = nn.Dense(self.dim, name="patch_embed")(x)
        x = nn.LayerNorm(name="patch_norm2")(x)
        f, h, w = (self.image_size[0] // pf, self.image_size[1] // ph,
                   self.image_size[2] // pw)
        x = x + jnp.asarray(_posemb_sincos_3d(f, h, w, self.dim))
        x = ViTTransformer(self.depth, self.heads, self.dim_head,
                           self.mlp_dim, name="transformer")(
            x, deterministic=deterministic)
        x = x.mean(axis=1)
        return nn.Dense(self.num_classes, name="linear_head")(x)


class ViViT(nn.Module):
    """vivit.py factorized variant: tubelet embed -> spatial
    transformer per frame -> temporal transformer -> head."""

    image_size: Sequence[int]        # (height, width)
    image_patch_size: Sequence[int]  # (ph, pw)
    frames: int
    frame_patch_size: int
    num_classes: int
    dim: int
    spatial_depth: int
    temporal_depth: int
    heads: int
    mlp_dim: int
    dim_head: int = 64
    pool: str = "cls"
    dropout: float = 0.0
    emb_dropout: float = 0.0

    @nn.compact
    def __call__(self, video: Array, *, deterministic: bool = True) -> Array:
        """video: (B, frames, H, W, C) channels-last."""
        assert self.pool in ("cls", "mean")
        ph, pw = self.image_patch_size
        pf = self.frame_patch_size
        x = rearrange(video, "b (f pf) (h p1) (w p2) c -> b f (h w) "
                      "(p1 p2 pf c)", pf=pf, p1=ph, p2=pw)
        x = nn.LayerNorm(name="patch_norm1")(x)
        x = nn.Dense(self.dim, name="patch_embed")(x)
        x = nn.LayerNorm(name="patch_norm2")(x)
        b, f, n, _ = x.shape
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, f, n, self.dim))
        x = x + pos
        gap = self.pool == "mean"
        if not gap:
            s_cls = self.param("spatial_cls_token",
                               nn.initializers.normal(1.0), (1, 1, self.dim))
            x = jnp.concatenate(
                [jnp.broadcast_to(s_cls[None], (b, f, 1, self.dim)), x],
                axis=2)
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)

        x = rearrange(x, "b f n d -> (b f) n d")
        x = ViTTransformer(self.spatial_depth, self.heads, self.dim_head,
                           self.mlp_dim, self.dropout,
                           name="spatial_transformer")(
            x, deterministic=deterministic)
        x = rearrange(x, "(b f) n d -> b f n d", b=b)
        x = x[:, :, 0] if not gap else x.mean(axis=2)   # (B, f, dim)

        if not gap:
            t_cls = self.param("temporal_cls_token",
                               nn.initializers.normal(1.0), (1, 1, self.dim))
            x = jnp.concatenate(
                [jnp.broadcast_to(t_cls, (b, 1, self.dim)), x], axis=1)
        x = ViTTransformer(self.temporal_depth, self.heads, self.dim_head,
                           self.mlp_dim, self.dropout,
                           name="temporal_transformer")(
            x, deterministic=deterministic)
        x = x[:, 0] if not gap else x.mean(axis=1)
        return nn.Dense(self.num_classes, name="mlp_head")(x)


class _ConvTokenizer(nn.Module):
    """CCT tokenizer (cct.py / cct_3d.py Tokenizer): [conv -> ReLU ->
    maxpool] x n, channels-last, output flattened to tokens.  For 3D
    the frame axis gets its own (smaller) kernel/stride/pooling, the
    reference's anisotropic defaults (cct_3d.py:162-199)."""

    n_output_channels: int
    n_conv_layers: int
    kernel_size: int
    stride: int
    pooling_kernel_size: int
    pooling_stride: int
    in_planes: int = 64
    dims: int = 2
    frame_kernel_size: int = 3
    frame_stride: int = 1
    frame_pooling_kernel_size: int = 1
    frame_pooling_stride: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        chans = ([self.in_planes] * (self.n_conv_layers - 1)
                 + [self.n_output_channels])
        sp = self.kernel_size // 2
        if self.dims == 3:
            kernel = (self.frame_kernel_size,) + (self.kernel_size,) * 2
            strides = (self.frame_stride,) + (self.stride,) * 2
            cpad = [(self.frame_kernel_size // 2,) * 2, (sp, sp), (sp, sp)]
            pool = (self.frame_pooling_kernel_size,
                    self.pooling_kernel_size, self.pooling_kernel_size)
            pstr = (self.frame_pooling_stride,
                    self.pooling_stride, self.pooling_stride)
            ppad = [(self.frame_pooling_kernel_size // 2,) * 2,
                    (1, 1), (1, 1)]
        else:
            kernel = (self.kernel_size,) * 2
            strides = (self.stride,) * 2
            cpad = [(sp, sp)] * 2
            pool = (self.pooling_kernel_size,) * 2
            pstr = (self.pooling_stride,) * 2
            ppad = [(1, 1)] * 2
        for i, ch in enumerate(chans):
            x = nn.Conv(ch, kernel, strides=strides, padding=cpad,
                        use_bias=False, name=f"conv_{i}")(x)
            x = jax.nn.relu(x)
            x = nn.max_pool(x, pool, strides=pstr, padding=ppad)
        return x.reshape(x.shape[0], -1, x.shape[-1])


def _sinusoidal_embedding(n: int, dim: int) -> np.ndarray:
    """CCT 'sine' positional table (cct_3d.py:75-80): position p,
    channel i -> p / 10000^(2*(i//2)/dim), sin on even, cos on odd."""
    pe = np.array([[p / 10000.0 ** (2 * (i // 2) / dim)
                    for i in range(dim)] for p in range(n)], np.float32)
    pe[:, 0::2] = np.sin(pe[:, 0::2])
    pe[:, 1::2] = np.cos(pe[:, 1::2])
    return pe[None]


class _CCTAttention(nn.Module):
    """CCT attention (cct_3d.py:84-112): fused qkv Linear (no bias),
    head dim = dim // heads, output proj with bias."""

    heads: int
    attention_dropout: float = 0.0
    proj_dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        d = x.shape[-1]
        qkv = nn.Dense(3 * d, use_bias=False, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (rearrange(t, "b n (h hd) -> b h n hd", h=self.heads)
                   for t in (q, k, v))
        q = q * (d // self.heads) ** -0.5
        attn = jax.nn.softmax(jnp.einsum("bhid,bhjd->bhij", q, k), axis=-1)
        attn = nn.Dropout(self.attention_dropout)(
            attn, deterministic=deterministic)
        out = rearrange(jnp.einsum("bhij,bhjd->bhid", attn, v),
                        "b h n hd -> b n (h hd)")
        out = nn.Dense(d, name="proj")(out)
        return nn.Dropout(self.proj_dropout)(out,
                                             deterministic=deterministic)


class CCT(nn.Module):
    """Compact Convolutional Transformer (cct.py / cct_3d.py): conv
    tokenizer, learnable pos embedding, transformer with stochastic
    depth, attention seq-pool head (TransformerClassifier,
    cct_3d.py:220-317)."""

    num_classes: int
    embedding_dim: int = 128
    n_conv_layers: int = 2
    kernel_size: int = 7
    stride: int = 2
    pooling_kernel_size: int = 3
    pooling_stride: int = 2
    num_layers: int = 7
    num_heads: int = 4
    mlp_ratio: float = 2.0
    stochastic_depth: float = 0.1
    dropout: float = 0.0
    attention_dropout: float = 0.1
    positional_embedding: str = "learnable"   # 'sine' | 'learnable' | 'none'
    seq_pool: bool = True
    dims: int = 2
    frame_kernel_size: int = 3
    frame_stride: int = 1
    frame_pooling_kernel_size: int = 1
    frame_pooling_stride: int = 1

    @nn.compact
    def __call__(self, img: Array, *, deterministic: bool = True) -> Array:
        x = _ConvTokenizer(
            self.embedding_dim, self.n_conv_layers, self.kernel_size,
            self.stride, self.pooling_kernel_size, self.pooling_stride,
            dims=self.dims, frame_kernel_size=self.frame_kernel_size,
            frame_stride=self.frame_stride,
            frame_pooling_kernel_size=self.frame_pooling_kernel_size,
            frame_pooling_stride=self.frame_pooling_stride,
            name="tokenizer")(img)
        n = x.shape[1]
        if not self.seq_pool:
            # class-token mode (cct_3d.py:248-250)
            cls = self.param("class_emb", nn.initializers.zeros,
                             (1, 1, self.embedding_dim))
            x = jnp.concatenate(
                [jnp.broadcast_to(cls, (x.shape[0], 1, self.embedding_dim)),
                 x], axis=1)
            n += 1
        if self.positional_embedding == "learnable":
            pos = self.param("pos_embedding",
                             nn.initializers.truncated_normal(0.2),
                             (1, n, self.embedding_dim))
            x = x + pos
        elif self.positional_embedding == "sine":
            x = x + jnp.asarray(
                _sinusoidal_embedding(n, self.embedding_dim))
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        dpr = np.linspace(0, self.stochastic_depth, self.num_layers)
        for i in range(self.num_layers):
            # TransformerEncoderLayer (cct_3d.py:114-142): NOTE the
            # reference re-assigns src = norm1(src) BETWEEN the
            # attention residual and the feed-forward residual, so the
            # FF residual rides the normed tensor -- not standard
            # pre-norm; reproduced exactly.
            h = nn.LayerNorm(name=f"pre_norm_{i}")(x)
            h = _CCTAttention(self.num_heads, self.attention_dropout,
                              self.dropout, name=f"attn_{i}")(
                h, deterministic=deterministic)
            x = x + _drop_path(h, dpr[i], deterministic, self, f"dp1_{i}")
            x = nn.LayerNorm(name=f"norm1_{i}")(x)
            h = nn.Dense(int(self.embedding_dim * self.mlp_ratio),
                         name=f"fc1_{i}")(x)
            h = nn.Dropout(self.dropout)(jax.nn.gelu(h),
                                         deterministic=deterministic)
            h = nn.Dense(self.embedding_dim, name=f"fc2_{i}")(h)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            x = x + _drop_path(h, dpr[i], deterministic, self, f"dp2_{i}")
        x = nn.LayerNorm(name="final_norm")(x)
        if self.seq_pool:
            # attention sequence pooling (cct_3d.py:305-310)
            attn = nn.Dense(1, name="attention_pool")(x)      # (B, N, 1)
            attn = jax.nn.softmax(attn, axis=1)
            x = jnp.einsum("bnl,bnd->bd", attn, x)
        else:
            x = x[:, 0]
        return nn.Dense(self.num_classes, name="fc")(x)


def CCT3D(**kwargs) -> CCT:
    """cct_3d.py: the same architecture with the anisotropic 3D conv
    tokenizer (frame axis kernel 3 / stride 1 / no frame pooling by
    default, cct_3d.py:336-357)."""
    return CCT(dims=3, **kwargs)


def _drop_path(h: Array, rate: float, deterministic: bool, mod: nn.Module,
               name: str) -> Array:
    """Per-sample stochastic depth (cct DropPath)."""
    if deterministic or rate == 0.0:
        return h
    rng = mod.make_rng("dropout")
    keep = jax.random.bernoulli(rng, 1.0 - rate,
                                (h.shape[0],) + (1,) * (h.ndim - 1))
    return h * keep / (1.0 - rate)


class _TalkingHeadsAttention(nn.Module):
    """CaiT attention: softmax(pre-mix(QK^T)) head-mixed again before V
    (cait.py Attention with talking heads)."""

    heads: int
    dim_head: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, context: Array | None = None,
                 *, deterministic: bool = True) -> Array:
        context = x if context is None else context
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        kv = nn.Dense(2 * inner, use_bias=False, name="to_kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)
        q, k, v = (rearrange(t, "b n (h d) -> b h n d", h=self.heads)
                   for t in (q, k, v))
        logits = jnp.einsum("bhid,bhjd->bhij", q, k) * self.dim_head ** -0.5
        mix_pre = self.param("mix_heads_pre",
                             nn.initializers.normal(1.0),
                             (self.heads, self.heads))
        mix_post = self.param("mix_heads_post",
                              nn.initializers.normal(1.0),
                              (self.heads, self.heads))
        logits = jnp.einsum("bhij,hg->bgij", logits, mix_pre)
        attn = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bhij,hg->bgij", attn, mix_post)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = rearrange(out, "b h n d -> b n (h d)")
        return nn.Dense(x.shape[-1], name="to_out")(out)


class _LayerScaleBlock(nn.Module):
    """PreNorm block with LayerScale (cait.py LayerScale wrapper)."""

    heads: int
    dim_head: int
    mlp_dim: int
    depth_index: int
    dropout: float = 0.0

    def _scale_init(self):
        # cait.py:16-23 depth-dependent init epsilon
        d = self.depth_index
        eps = 0.1 if d < 18 else (1e-5 if d > 24 else 1e-6)
        return nn.initializers.constant(eps)

    @nn.compact
    def __call__(self, x: Array, context: Array | None = None,
                 *, deterministic: bool = True) -> Array:
        dim = x.shape[-1]
        s1 = self.param("scale_attn", self._scale_init(), (dim,))
        h = nn.LayerNorm(name="norm1")(x)
        ctx = None if context is None else nn.LayerNorm(name="norm_ctx")(
            context)
        h = _TalkingHeadsAttention(
            self.heads, self.dim_head, self.dropout, name="attn")(
            h, ctx, deterministic=deterministic)
        x = x + h * s1
        s2 = self.param("scale_ff", self._scale_init(), (dim,))
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(self.mlp_dim, name="ff1")(h)
        h = jax.nn.gelu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(dim, name="ff2")(h)
        return x + h * s2


class CaiT(nn.Module):
    """cait.py: patch transformer (talking heads + LayerScale), then
    ``cls_depth`` class-attention layers where only the CLS token
    queries the (frozen) patch tokens, then the head."""

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

    @nn.compact
    def __call__(self, img: Array, *, deterministic: bool = True) -> Array:
        p = self.patch_size
        x = rearrange(img, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)",
                      p1=p, p2=p)
        x = nn.Dense(self.dim, name="patch_embed")(x)
        n = x.shape[1]
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, n, self.dim))
        x = x + pos
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)
        for i in range(self.depth):
            x = _LayerScaleBlock(self.heads, self.dim_head, self.mlp_dim,
                                 i + 1, self.dropout, name=f"block_{i}")(
                x, deterministic=deterministic)
        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (1, 1, self.dim))
        cls = jnp.broadcast_to(cls, (x.shape[0], 1, self.dim))
        for i in range(self.cls_depth):
            cls = _LayerScaleBlock(
                self.heads, self.dim_head, self.mlp_dim,
                self.depth + i + 1, self.dropout, name=f"cls_block_{i}")(
                cls, context=jnp.concatenate([cls, x], axis=1),
                deterministic=deterministic)
        cls = nn.LayerNorm(name="norm")(cls[:, 0])
        return nn.Dense(self.num_classes, name="mlp_head")(cls)


class _ReAttention(nn.Module):
    """DeepViT re-attention (deepvit.py Attention): a learned
    head-mixing conv over the softmaxed attention maps."""

    heads: int
    dim_head: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        inner = self.heads * self.dim_head
        qkv = nn.Dense(3 * inner, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (rearrange(t, "b n (h d) -> b h n d", h=self.heads)
                   for t in (q, k, v))
        attn = jax.nn.softmax(
            jnp.einsum("bhid,bhjd->bhij", q, k) * self.dim_head ** -0.5,
            axis=-1)
        mix = self.param("reattn_weights", nn.initializers.normal(1.0),
                         (self.heads, self.heads))
        attn = jnp.einsum("bhij,hg->bgij", attn, mix)
        # reattn_norm: LayerNorm over the token dim j (deepvit.py:44-47)
        attn = nn.LayerNorm(name=f"reattn_norm")(attn)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = rearrange(out, "b h n d -> b n (h d)")
        out = nn.Dense(x.shape[-1], name="to_out")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class DeepViT(nn.Module):
    """deepvit.py: standard ViT classifier with re-attention blocks."""

    image_size: int
    patch_size: int
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    dim_head: int = 64
    pool: str = "cls"
    dropout: float = 0.0
    emb_dropout: float = 0.0

    @nn.compact
    def __call__(self, img: Array, *, deterministic: bool = True) -> Array:
        p = self.patch_size
        x = rearrange(img, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)",
                      p1=p, p2=p)
        x = nn.Dense(self.dim, name="patch_embed")(x)
        b, n, _ = x.shape
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, n + 1, self.dim))
        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)), x],
                            axis=1) + pos
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)
        for i in range(self.depth):
            h = nn.LayerNorm(name=f"norm1_{i}")(x)
            x = x + _ReAttention(self.heads, self.dim_head, self.dropout,
                                 name=f"attn_{i}")(
                h, deterministic=deterministic)
            h = nn.LayerNorm(name=f"norm2_{i}")(x)
            h = nn.Dense(self.mlp_dim, name=f"ff1_{i}")(h)
            h = jax.nn.gelu(h)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            x = x + nn.Dense(self.dim, name=f"ff2_{i}")(h)
        x = x[:, 0] if self.pool == "cls" else x.mean(axis=1)
        return nn.Dense(self.num_classes, name="mlp_head")(x)


def _unfold2d(x: Array, k: int, stride: int, padding: int) -> Array:
    """torch nn.Unfold equivalent on channels-last (B,H,W,C) ->
    (B, N, C*k*k) patch tokens."""
    patches = jax.lax.conv_general_dilated_patches(
        jnp.moveaxis(x, -1, 1), (k, k), (stride, stride),
        [(padding, padding)] * 2)           # (B, C*k*k, H', W')
    return rearrange(patches, "b c h w -> b (h w) c")


class PiT(nn.Module):
    """Pooling-based ViT (pit.py:117-183): overlapping unfold patch
    embedding (stride p//2), transformer stages separated by Pool =
    depthwise stride-2 conv on the spatial tokens + Linear on CLS
    (dim doubles per stage)."""

    image_size: int
    patch_size: int
    num_classes: int
    dim: int
    depth: Sequence[int]
    heads: Sequence[int]
    mlp_dim: int
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0

    @nn.compact
    def __call__(self, img: Array, *, deterministic: bool = True) -> Array:
        p = self.patch_size
        x = _unfold2d(img, p, p // 2, 0)
        x = nn.Dense(self.dim, name="patch_embed")(x)
        b, n, _ = x.shape
        side = int(round(n ** 0.5))
        cls = self.param("cls_token", nn.initializers.normal(1.0),
                        (1, 1, self.dim))
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, n + 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)), x],
                            axis=1) + pos
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)

        dim = self.dim
        from gfe_mamba_tpu.models.vit import ViTTransformer
        for i, (d, h) in enumerate(zip(self.depth, self.heads)):
            x = ViTTransformer(d, h, self.dim_head, self.mlp_dim,
                               self.dropout, name=f"stage_{i}")(
                x, deterministic=deterministic)
            if i < len(self.depth) - 1:
                cls_t, toks = x[:, :1], x[:, 1:]
                cls_t = nn.Dense(2 * dim, name=f"pool_cls_{i}")(cls_t)
                grid = toks.reshape(b, side, side, dim)
                grid = nn.Conv(2 * dim, (3, 3), strides=(2, 2), padding=1,
                               feature_group_count=dim,
                               name=f"pool_conv_{i}")(grid)
                side = grid.shape[1]
                toks = grid.reshape(b, side * side, 2 * dim)
                x = jnp.concatenate([cls_t, toks], axis=1)
                dim *= 2
        x = nn.LayerNorm(name="head_norm")(x[:, 0])
        return nn.Dense(self.num_classes, name="mlp_head")(x)


class T2TViT(nn.Module):
    """Tokens-to-Token ViT (t2t.py:26-80): progressive soft-split
    (unfold) tokenization with 1-head transformers between splits,
    then a standard CLS ViT backbone."""

    image_size: int
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    dim_head: int = 64
    pool: str = "cls"
    t2t_layers: Sequence[Sequence[int]] = ((7, 4), (3, 2), (3, 2))
    dropout: float = 0.0
    emb_dropout: float = 0.0

    @nn.compact
    def __call__(self, img: Array, *, deterministic: bool = True) -> Array:
        from gfe_mamba_tpu.models.vit import ViTTransformer

        x = img
        layer_dim = img.shape[-1]
        size = self.image_size
        for i, (k, s) in enumerate(self.t2t_layers):
            if i > 0:  # tokens -> image (RearrangeImage)
                side = int(round(x.shape[1] ** 0.5))
                x = x.reshape(x.shape[0], side, side, x.shape[-1])
            layer_dim *= k * k
            x = _unfold2d(x, k, s, s // 2)
            size = (size + 2 * (s // 2) - k) // s + 1
            if i < len(self.t2t_layers) - 1:
                x = ViTTransformer(1, 1, layer_dim, layer_dim,
                                   self.dropout, name=f"t2t_{i}")(
                    x, deterministic=deterministic)
        x = nn.Dense(self.dim, name="t2t_project")(x)

        b, n, _ = x.shape
        cls = self.param("cls_token", nn.initializers.normal(1.0),
                        (1, 1, self.dim))
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, n + 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)), x],
                            axis=1) + pos
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)
        x = ViTTransformer(self.depth, self.heads, self.dim_head,
                           self.mlp_dim, self.dropout, name="transformer")(
            x, deterministic=deterministic)
        x = x[:, 0] if self.pool == "cls" else x.mean(axis=1)
        x = nn.LayerNorm(name="head_norm")(x)
        return nn.Dense(self.num_classes, name="mlp_head")(x)


class _CrossAttendOnce(nn.Module):
    """One CrossViT exchange (cross_vit.py:111-131): each branch's CLS
    is projected into the other branch's dim, attends over [own-CLS +
    other-branch patch tokens], and is projected back (ProjectInOut)."""

    heads: int
    dim_head: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, cls_a: Array, tokens_b: Array, dim_b: int) -> Array:
        dim_a = cls_a.shape[-1]
        q_in = nn.Dense(dim_b, name="proj_in")(cls_a)
        ctx = jnp.concatenate([q_in, tokens_b], axis=1)
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, name="to_q")(
            nn.LayerNorm(name="norm")(q_in))
        kv = nn.Dense(2 * inner, use_bias=False, name="to_kv")(ctx)
        k, v = jnp.split(kv, 2, axis=-1)
        q, k, v = (rearrange(t, "b n (h d) -> b h n d", h=self.heads)
                   for t in (q, k, v))
        attn = jax.nn.softmax(
            jnp.einsum("bhid,bhjd->bhij", q, k) * self.dim_head ** -0.5, -1)
        out = rearrange(jnp.einsum("bhij,bhjd->bhid", attn, v),
                        "b h n d -> b n (h d)")
        out = nn.Dense(dim_b, name="to_out")(out)
        return cls_a + nn.Dense(dim_a, name="proj_out")(q_in + out)


class CrossViT(nn.Module):
    """Dual-branch multi-scale ViT (cross_vit.py:183-260): small-patch
    and large-patch branches with their own transformers, exchanging
    CLS tokens via projected cross-attention each round; the two heads'
    logits are summed."""

    image_size: int
    num_classes: int
    sm_patch_size: int = 4
    lg_patch_size: int = 8
    sm_dim: int = 64
    lg_dim: int = 96
    sm_enc_depth: int = 1
    lg_enc_depth: int = 1
    cross_attn_depth: int = 1
    multi_scale_enc_depth: int = 2
    heads: int = 4
    dim_head: int = 32
    mlp_mult: int = 2
    dropout: float = 0.0
    emb_dropout: float = 0.0

    def _embed(self, img, patch, dim, tag, deterministic):
        x = rearrange(img, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)",
                      p1=patch, p2=patch)
        x = nn.Dense(dim, name=f"{tag}_patch_embed")(x)
        b, n, _ = x.shape
        cls = self.param(f"{tag}_cls_token", nn.initializers.normal(1.0),
                        (1, 1, dim))
        pos = self.param(f"{tag}_pos_embedding",
                         nn.initializers.normal(1.0), (1, n + 1, dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, dim)), x],
                            axis=1) + pos
        return nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)

    @nn.compact
    def __call__(self, img: Array, *, deterministic: bool = True) -> Array:
        from gfe_mamba_tpu.models.vit import ViTTransformer

        sm = self._embed(img, self.sm_patch_size, self.sm_dim, "sm",
                         deterministic)
        lg = self._embed(img, self.lg_patch_size, self.lg_dim, "lg",
                         deterministic)
        for i in range(self.multi_scale_enc_depth):
            sm = ViTTransformer(self.sm_enc_depth, self.heads,
                                self.dim_head, self.sm_dim * self.mlp_mult,
                                self.dropout, name=f"sm_enc_{i}")(
                sm, deterministic=deterministic)
            lg = ViTTransformer(self.lg_enc_depth, self.heads,
                                self.dim_head, self.lg_dim * self.mlp_mult,
                                self.dropout, name=f"lg_enc_{i}")(
                lg, deterministic=deterministic)
            for j in range(self.cross_attn_depth):
                sm_cls = _CrossAttendOnce(
                    self.heads, self.dim_head, self.dropout,
                    name=f"sm_attend_lg_{i}_{j}")(
                    sm[:, :1], lg[:, 1:], self.lg_dim)
                lg_cls = _CrossAttendOnce(
                    self.heads, self.dim_head, self.dropout,
                    name=f"lg_attend_sm_{i}_{j}")(
                    lg[:, :1], sm[:, 1:], self.sm_dim)
                sm = jnp.concatenate([sm_cls, sm[:, 1:]], axis=1)
                lg = jnp.concatenate([lg_cls, lg[:, 1:]], axis=1)
        sm_logits = nn.Dense(self.num_classes, name="sm_mlp_head")(
            nn.LayerNorm(name="sm_norm")(sm[:, 0]))
        lg_logits = nn.Dense(self.num_classes, name="lg_mlp_head")(
            nn.LayerNorm(name="lg_norm")(lg[:, 0]))
        return sm_logits + lg_logits


class MPP(nn.Module):
    """Masked Patch Prediction pretraining wrapper (mpp.py:79-180) --
    the third self-supervised member next to MAE and DINO: mask a
    ceil(mask_prob*N) patch subset, corrupt it (mask token with
    ``replace_prob``, random other patch with ``random_patch_prob``),
    run a CLS ViT trunk, and classify each masked patch's discretized
    mean color (``output_channel_bits`` bins/channel, MPPLoss
    mpp.py:33-73).  Returns the scalar loss."""

    image_size: int
    patch_size: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    channels: int = 1
    dim_head: int = 64
    mask_prob: float = 0.15
    replace_prob: float = 0.5
    random_patch_prob: float = 0.5
    output_channel_bits: int = 3
    max_pixel_val: float = 1.0
    dropout: float = 0.0

    @nn.compact
    def __call__(self, img: Array, *, deterministic: bool = False) -> Array:
        p, c = self.patch_size, self.channels
        patches = rearrange(img, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)",
                            p1=p, p2=p)
        b, n, pd = patches.shape
        rng = self.make_rng("mpp")
        k_noise, k_rand, k_coin1, k_coin2 = jax.random.split(rng, 4)

        # top-ceil(prob*n) mask (get_mask_subset_with_prob)
        n_masked = int(np.ceil(self.mask_prob * n))
        noise = jax.random.uniform(k_noise, (b, n))
        rank = jnp.argsort(jnp.argsort(-noise, axis=-1), axis=-1)
        mask = rank < n_masked                          # (b, n) bool

        corrupted = patches
        if self.random_patch_prob > 0:
            rp = self.random_patch_prob / (1 - self.replace_prob)
            coin = jax.random.uniform(k_coin1, (b, n)) < rp
            idx = jax.random.randint(k_rand, (b, n), 0, n)
            shuffled = jnp.take_along_axis(patches, idx[..., None], axis=1)
            corrupted = jnp.where((mask & coin)[..., None], shuffled,
                                  corrupted)
        mask_token = self.param("mask_token", nn.initializers.normal(1.0),
                                (1, 1, pd))
        coin2 = jax.random.uniform(k_coin2, (b, n)) < self.replace_prob
        corrupted = jnp.where((mask & coin2)[..., None], mask_token,
                              corrupted)

        x = nn.Dense(self.dim, name="patch_to_emb")(corrupted)
        cls = self.param("cls_token", nn.initializers.normal(1.0),
                        (1, 1, self.dim))
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, n + 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)), x],
                            axis=1) + pos
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = ViTTransformer(self.depth, self.heads, self.dim_head,
                           self.mlp_dim, self.dropout, name="transformer")(
            x, deterministic=deterministic)
        n_bins = 2 ** self.output_channel_bits
        logits = nn.Dense(n_bins ** c, name="to_bits")(x)[:, 1:]

        # discretized mean-color target (MPPLoss)
        avg = rearrange(img, "b (h p1) (w p2) c -> b (h w) (p1 p2) c",
                        p1=p, p2=p).mean(axis=2)
        avg = jnp.clip(avg, a_max=self.max_pixel_val)
        bin_size = self.max_pixel_val / n_bins
        edges = jnp.arange(bin_size, self.max_pixel_val, bin_size)
        disc = jnp.searchsorted(edges, avg)             # (b, n, c)
        weights = n_bins ** jnp.arange(c)
        labels = jnp.sum(disc * weights, axis=-1)       # (b, n)

        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1)


class _CvTAttention(nn.Module):
    """CvT attention (cvt.py:62-97): depthwise-conv q/kv projections
    (kv strided for token reduction), spatial tokens, conv out proj.
    Channels-last feature maps throughout."""

    proj_kernel: int
    kv_proj_stride: int
    heads: int
    dim_head: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        b, hh, ww, dim = x.shape
        inner = self.heads * self.dim_head
        pk = self.proj_kernel
        xn = nn.LayerNorm(name="norm")(x)

        def dwconv(t, feat, stride, name):
            t = nn.Conv(t.shape[-1], (pk, pk), strides=(stride, stride),
                        padding=pk // 2, feature_group_count=t.shape[-1],
                        use_bias=False, name=f"{name}_dw")(t)
            return nn.Conv(feat, (1, 1), use_bias=False,
                           name=f"{name}_pw")(t)

        q = dwconv(xn, inner, 1, "to_q")
        kv = dwconv(xn, 2 * inner, self.kv_proj_stride, "to_kv")
        k, v = jnp.split(kv, 2, axis=-1)
        q = rearrange(q, "b x y (h d) -> b h (x y) d", h=self.heads)
        k = rearrange(k, "b x y (h d) -> b h (x y) d", h=self.heads)
        v = rearrange(v, "b x y (h d) -> b h (x y) d", h=self.heads)
        attn = jax.nn.softmax(
            jnp.einsum("bhid,bhjd->bhij", q, k) * self.dim_head ** -0.5, -1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = rearrange(out, "b h (x y) d -> b x y (h d)", x=hh, y=ww)
        return nn.Conv(dim, (1, 1), name="to_out")(out)


class CvT(nn.Module):
    """Convolutional vision Transformer (cvt.py:114-175): three stages
    of [strided conv embedding -> LN -> transformer with conv
    projections], mean-pooled linear head."""

    num_classes: int
    emb_dims: Sequence[int] = (64, 192, 384)
    emb_kernels: Sequence[int] = (7, 3, 3)
    emb_strides: Sequence[int] = (4, 2, 2)
    proj_kernel: int = 3
    kv_proj_strides: Sequence[int] = (2, 2, 2)
    heads: Sequence[int] = (1, 3, 6)
    depths: Sequence[int] = (1, 2, 3)
    mlp_mult: int = 4
    dim_head: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, img: Array, *, deterministic: bool = True) -> Array:
        x = img
        for s in range(len(self.emb_dims)):
            k = self.emb_kernels[s]
            x = nn.Conv(self.emb_dims[s], (k, k),
                        strides=(self.emb_strides[s],) * 2, padding=k // 2,
                        name=f"s{s}_embed")(x)
            x = nn.LayerNorm(name=f"s{s}_norm")(x)
            for d in range(self.depths[s]):
                x = x + _CvTAttention(
                    self.proj_kernel, self.kv_proj_strides[s],
                    self.heads[s], self.dim_head, self.dropout,
                    name=f"s{s}_attn_{d}")(x, deterministic=deterministic)
                h = nn.LayerNorm(name=f"s{s}_ffnorm_{d}")(x)
                h = nn.Conv(self.emb_dims[s] * self.mlp_mult, (1, 1),
                            name=f"s{s}_ff1_{d}")(h)
                h = jax.nn.gelu(h)
                h = nn.Conv(self.emb_dims[s], (1, 1),
                            name=f"s{s}_ff2_{d}")(h)
                x = x + h
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, name="mlp_head")(x)


class NesT(nn.Module):
    """Nested Transformer (nest.py:106-181): patch embed, then per
    hierarchy level block the map into 2^level x 2^level regions, run
    a local transformer (constant sequence length) inside each block,
    un-block, and Aggregate (conv+LN+maxpool) down; mean-pool head."""

    image_size: int
    patch_size: int
    num_classes: int
    dim: int
    heads: int
    num_hierarchies: int
    block_repeats: Sequence[int]
    mlp_mult: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, img: Array, *, deterministic: bool = True) -> Array:
        p = self.patch_size
        x = rearrange(img, "b (h p1) (w p2) c -> b h w (p1 p2 c)",
                      p1=p, p2=p)
        x = nn.LayerNorm(name="patch_norm1")(x)
        hier = list(reversed(range(self.num_hierarchies)))
        dims = [self.dim * 2 ** i for i in reversed(hier)]
        x = nn.Conv(dims[0], (1, 1), name="patch_embed")(x)
        x = nn.LayerNorm(name="patch_norm2")(x)

        for li, level in enumerate(hier):
            bs = 2 ** level
            b, hh, ww, dim = x.shape
            x = rearrange(x, "b (b1 h) (b2 w) d -> (b b1 b2) h w d",
                          b1=bs, b2=bs)
            pos = self.param(f"pos_emb_{li}", nn.initializers.normal(1.0),
                             (x.shape[1] * x.shape[2],))
            x = x + pos.reshape(1, x.shape[1], x.shape[2], 1)
            # heads scale with dim (nest.py layer_heads = mult * heads)
            heads = self.heads * (dim // dims[0])
            for d in range(self.block_repeats[li]):
                h = nn.LayerNorm(name=f"l{li}_norm1_{d}")(x)
                h = rearrange(h, "b x y d -> b (x y) d")
                inner = dim
                qkv = nn.Dense(3 * inner, use_bias=False,
                               name=f"l{li}_qkv_{d}")(h)
                q, k, v = jnp.split(qkv, 3, axis=-1)
                nh = max(1, heads)
                q, k, v = (rearrange(t, "b n (h e) -> b h n e", h=nh)
                           for t in (q, k, v))
                scale = (inner // nh) ** -0.5
                attn = jax.nn.softmax(
                    jnp.einsum("bhie,bhje->bhij", q, k) * scale, -1)
                o = jnp.einsum("bhij,bhje->bhie", attn, v)
                o = rearrange(o, "b h (x y) e -> b x y (h e)",
                              x=x.shape[1])
                x = x + nn.Dense(dim, name=f"l{li}_attnout_{d}")(o)
                h = nn.LayerNorm(name=f"l{li}_norm2_{d}")(x)
                h = nn.Dense(dim * self.mlp_mult, name=f"l{li}_ff1_{d}")(h)
                h = jax.nn.gelu(h)
                x = x + nn.Dense(dim, name=f"l{li}_ff2_{d}")(h)
            x = rearrange(x, "(b b1 b2) h w d -> b (b1 h) (b2 w) d",
                          b1=bs, b2=bs)
            if level != 0:
                x = nn.Conv(dims[li + 1], (3, 3), padding=1,
                            name=f"aggregate_{li}")(x)
                x = nn.LayerNorm(name=f"agg_norm_{li}")(x)
                x = nn.max_pool(x, (3, 3), strides=(2, 2),
                                padding=((1, 1), (1, 1)))
        x = nn.LayerNorm(name="head_norm")(x).mean(axis=(1, 2))
        return nn.Dense(self.num_classes, name="mlp_head")(x)


class _ConvBnSiLU(nn.Module):
    """conv_nxn_bn/conv_1x1_bn of mobile_vit.py: conv -> BN -> SiLU."""

    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=self.kernel // 2, use_bias=False,
                    feature_group_count=self.groups, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        return jax.nn.silu(x)


class _MV2Block(nn.Module):
    """MobileNetV2 inverted residual (mobile_vit.py:94-139)."""

    features: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        inp = x.shape[-1]
        hidden = inp * self.expansion
        h = x
        if self.expansion != 1:
            h = _ConvBnSiLU(hidden, 1, name="pw")(h, train=train)
        h = _ConvBnSiLU(hidden, 3, self.stride, groups=hidden,
                        name="dw")(h, train=train)
        h = nn.Conv(self.features, (1, 1), use_bias=False,
                    name="pw_linear")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn_out")(h)
        if self.stride == 1 and inp == self.features:
            h = h + x
        return h


class _MobileViTBlock(nn.Module):
    """Local conv + unfolded-patch global transformer + fusion
    (mobile_vit.py:141-172)."""

    dim: int
    depth: int
    channel: int
    kernel_size: int
    patch_size: Sequence[int]
    mlp_dim: int

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        ph, pw = self.patch_size
        y = x
        h = _ConvBnSiLU(self.channel, self.kernel_size, name="conv1")(
            x, train=train)
        h = _ConvBnSiLU(self.dim, 1, name="conv2")(h, train=train)
        hh, ww = h.shape[1], h.shape[2]
        h = rearrange(h, "b (h ph) (w pw) d -> b (ph pw) (h w) d",
                      ph=ph, pw=pw)
        b, np_, nt, d = h.shape
        h = ViTTransformer(self.depth, 4, 8, self.mlp_dim,
                           name="transformer")(
            h.reshape(b * np_, nt, d)).reshape(b, np_, nt, d)
        h = rearrange(h, "b (ph pw) (h w) d -> b (h ph) (w pw) d",
                      h=hh // ph, w=ww // pw, ph=ph, pw=pw)
        h = _ConvBnSiLU(self.channel, 1, name="conv3")(h, train=train)
        h = jnp.concatenate([h, y], axis=-1)
        return _ConvBnSiLU(self.channel, self.kernel_size, name="conv4")(
            h, train=train)


class MobileViT(nn.Module):
    """MobileViT (mobile_vit.py:173-248): MV2 stem, three
    MV2-downsample + MobileViT-block stages, 1x1 head."""

    image_size: Sequence[int]
    dims: Sequence[int]
    channels: Sequence[int]
    num_classes: int
    expansion: int = 4
    kernel_size: int = 3
    patch_size: Sequence[int] = (2, 2)
    depths: Sequence[int] = (2, 4, 3)

    @nn.compact
    def __call__(self, img: Array, *, train: bool = False) -> Array:
        ch = self.channels
        x = _ConvBnSiLU(ch[0], 3, 2, name="conv1")(img, train=train)
        x = _MV2Block(ch[1], 1, self.expansion, name="stem0")(x, train=train)
        x = _MV2Block(ch[2], 2, self.expansion, name="stem1")(x, train=train)
        x = _MV2Block(ch[3], 1, self.expansion, name="stem2")(x, train=train)
        x = _MV2Block(ch[3], 1, self.expansion, name="stem3")(x, train=train)
        for s in range(3):
            x = _MV2Block(ch[3 + 2 * s + 1], 2, self.expansion,
                          name=f"trunk{s}_mv2")(x, train=train)
            x = _MobileViTBlock(
                self.dims[s], self.depths[s], ch[3 + 2 * s + 2],
                self.kernel_size, self.patch_size,
                int(self.dims[s] * (2 if s == 0 else 4)),
                name=f"trunk{s}_vit")(x, train=train)
        x = _ConvBnSiLU(ch[-1], 1, name="head_conv")(x, train=train)
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, use_bias=False,
                        name="mlp_head")(x)
