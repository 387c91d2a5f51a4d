"""FT-Transformer components and tabular transformer models.

Re-implements reference cross_atten/corss_ft_transformer.py: GEGLU /
FeedForward (l.10-22), attention returning post-softmax maps (l.24-62),
``FTTransformerEncoder`` (Transformer, l.66-98), ``TransformerCross``
(interleaved cross-attention, l.100-146), ``NumericalEmbedder``
(l.150-163), and the full tabular models ``CrossTransformerBoth``
(l.165-286), ``CrossTransformer`` (l.289-404), ``FTTransformerCrossImg``
(l.406-521) and ``FTTransformerCross`` (l.524-637).

The shared tabular-embedding machinery (category offsets + embedding
table + per-feature affine numerical embedding + CLS) lives in
``TabularEmbedder`` and is reused by the Mamba/Jamba fusion models in
:mod:`gfe_mamba_tpu.models.fusion`.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange
from flax import linen as nn

from gfe_mamba_tpu.models.attention import CrossAttention

Array = jax.Array


class GEGLU(nn.Module):
    """x, gates = split(x); x * gelu(gates) (corss_ft_transformer.py:10-13)."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x, gates = jnp.split(x, 2, axis=-1)
        return x * nn.gelu(gates)


class FeedForward(nn.Module):
    """LN -> Dense(2*mult*dim) -> GEGLU -> Dropout -> Dense(dim)
    (corss_ft_transformer.py:15-22)."""

    mult: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        dim = x.shape[-1]
        x = nn.LayerNorm()(x)
        x = nn.Dense(dim * self.mult * 2)(x)
        x = GEGLU()(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(dim)(x)


class FTAttention(nn.Module):
    """Pre-norm MHSA that also returns the post-softmax map
    (corss_ft_transformer.py:24-62)."""

    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True):
        dim = x.shape[-1]
        inner = self.heads * self.dim_head
        x = nn.LayerNorm(name="norm")(x)
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (rearrange(t, "b n (h d) -> b h n d", h=self.heads)
                   for t in (q, k, v))
        sim = jnp.einsum("bhid,bhjd->bhij", q * self.dim_head ** -0.5, k)
        attn = jax.nn.softmax(sim, axis=-1)
        dropped = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhij,bhjd->bhid", dropped, v)
        out = rearrange(out, "b h n d -> b n (h d)")
        out = nn.Dense(dim, use_bias=False, name="to_out")(out)
        return out, attn


class FTTransformerEncoder(nn.Module):
    """Residual FTAttention/FeedForward stack (corss_ft_transformer.py:66-98)."""

    depth: int
    heads: int
    dim_head: int
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True,
                 return_attn: bool = False):
        attns = []
        for i in range(self.depth):
            out, attn = FTAttention(
                self.heads, self.dim_head, self.attn_dropout, name=f"attn_{i}"
            )(x, deterministic=deterministic)
            attns.append(attn)
            x = out + x
            x = FeedForward(dropout=self.ff_dropout, name=f"ff_{i}")(
                x, deterministic=deterministic) + x
        if return_attn:
            return x, jnp.stack(attns)
        return x


class TransformerCross(nn.Module):
    """Interleaved cross-attention + self-attention stack
    (corss_ft_transformer.py:100-146)."""

    depth: int
    heads: int
    dim_head: int
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, condition: Array, *,
                 deterministic: bool = True, return_attn: bool = False):
        dim = x.shape[-1]
        attns = []
        for i in range(self.depth):
            x = CrossAttention(self.heads, dim, name=f"cross_{i}")(
                x, condition) + x
            out, attn = FTAttention(
                self.heads, self.dim_head, self.attn_dropout, name=f"attn_{i}"
            )(x, deterministic=deterministic)
            attns.append(attn)
            x = out + x
            x = FeedForward(dropout=self.ff_dropout, name=f"ff_{i}")(
                x, deterministic=deterministic) + x
        if return_attn:
            return x, jnp.stack(attns)
        return x


class NumericalEmbedder(nn.Module):
    """Per-feature affine lift to dim (corss_ft_transformer.py:150-163)."""

    dim: int
    num_numerical_types: int
    shrink_dim: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n = self.num_numerical_types
        if self.shrink_dim:
            x = nn.Dense(n // 2, name="linear")(x)
            n = n // 2
        weights = self.param("weights", nn.initializers.normal(1.0),
                             (n, self.dim))
        biases = self.param("biases", nn.initializers.normal(1.0),
                            (n, self.dim))
        return x[..., None] * weights + biases


def category_offsets(categories: Sequence[int],
                     num_special_tokens: int) -> np.ndarray:
    """Exclusive cumulative offsets so each column indexes its own slice
    of the shared embedding table (corss_ft_transformer.py:198-201)."""
    return np.concatenate(
        [[num_special_tokens],
         num_special_tokens + np.cumsum(np.asarray(categories[:-1]))]
    ).astype(np.int32) if len(categories) > 1 else np.asarray(
        [num_special_tokens], np.int32)


class TabularEmbedder(nn.Module):
    """Categorical + numerical token embedding with a CLS token
    (shared across every `*_both` fusion model,
    corss_ft_transformer.py:186-216,248-269)."""

    categories: Sequence[int]
    num_continuous: int
    dim: int
    num_special_tokens: int = 2

    @nn.compact
    def __call__(self, x_categ: Array, x_numer: Array) -> Array:
        assert x_categ.shape[-1] == len(self.categories), (
            f"expected {len(self.categories)} categorical columns, got "
            f"{x_categ.shape[-1]}"
        )
        num_unique = int(sum(self.categories))
        xs = []
        if num_unique > 0:
            offsets = jnp.asarray(
                category_offsets(self.categories, self.num_special_tokens))
            # N(0,1) mirrors torch nn.Embedding's default
            # (corss_ft_transformer.py:205); flax's default
            # variance-scaling draw is 1/sqrt(dim) NARROWER, which
            # measurably shifts early stage-2 token statistics
            table = nn.Embed(num_unique + self.num_special_tokens, self.dim,
                             embedding_init=nn.initializers.normal(1.0),
                             name="categorical_embeds")
            xs.append(table(x_categ.astype(jnp.int32) + offsets))
        if self.num_continuous > 0:
            xs.append(NumericalEmbedder(
                self.dim, self.num_continuous, name="numerical_embedder"
            )(x_numer))
        if xs:
            x = jnp.concatenate(xs, axis=1)
        else:
            # tableless mode (classify_mamba table_path=''): CLS only
            x = jnp.zeros((x_categ.shape[0], 0, self.dim))
        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (1, 1, self.dim))
        cls = jnp.broadcast_to(cls, (x.shape[0], 1, self.dim))
        return jnp.concatenate([cls, x], axis=1)


def flatten_volume_condition(volumes: Sequence[Array]) -> Array:
    """Channels-last volumes (B, H, W, D, C) -> slice tokens
    (B, sum(D*C), H*W): the pixel-context K/V source of the final
    cross-attention (mamba_transformer.py:89-94).  For C=1 volumes at
    (160,160,96) this yields (B, 192, 25600) for [MRI, PET]."""
    toks = [rearrange(v, "b h w d c -> b (d c) (h w)") for v in volumes]
    return jnp.concatenate(toks, axis=1)


class LogitsHead(nn.Module):
    """LayerNorm -> (optional ReLU) -> Dense(dim_out)
    (corss_ft_transformer.py:231-234,470-474)."""

    dim_out: int = 1
    relu: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.LayerNorm()(x)
        if self.relu:
            x = jax.nn.relu(x)
        return nn.Dense(self.dim_out)(x)


class _TabularCrossBase(nn.Module):
    """Shared config for the tabular x image fusion models."""

    categories: Sequence[int]
    num_continuous: int
    dim: int
    depth: int
    heads: int
    dim_head: int = 16
    dim_out: int = 1
    num_special_tokens: int = 2
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    cross_ff_multi: int = 2
    cross_ff_dropout: float = 0.1


class CrossTransformerBoth(_TabularCrossBase):
    """Transformer-mixer twin of Cross_mamba_both
    (corss_ft_transformer.py:165-286): tabular+image tokens through an
    FT-Transformer, CLS token cross-attends over [MRI, PET] pixels."""

    @nn.compact
    def __call__(self, x_categ: Array, x_numer: Array, feature_img: Array,
                 image_condition: Sequence[Array] | None = None, *,
                 deterministic: bool = True) -> Array:
        x = TabularEmbedder(self.categories, self.num_continuous, self.dim,
                            self.num_special_tokens, name="embed")(
            x_categ, x_numer)
        x = jnp.concatenate([x, feature_img], axis=1)
        x = FTTransformerEncoder(
            self.depth, self.heads, self.dim_head, self.attn_dropout,
            self.ff_dropout, name="transformer",
        )(x, deterministic=deterministic)
        x = x[:, 0:1]  # CLS (corss_ft_transformer.py:277)
        if image_condition is not None:
            cond = flatten_volume_condition(image_condition)
            x = CrossAttention(self.heads, self.dim, name="final_cross")(
                x, cond) + x
            x = FeedForward(self.cross_ff_multi, self.cross_ff_dropout,
                            name="final_feed")(
                x, deterministic=deterministic) + x
        x = x[:, 0]
        return LogitsHead(self.dim_out, name="to_logits")(x)


class CrossTransformer(_TabularCrossBase):
    """Single-volume condition variant (corss_ft_transformer.py:289-404)."""

    @nn.compact
    def __call__(self, x_categ: Array, x_numer: Array, feature_img: Array,
                 image_condition: Array | None = None, *,
                 deterministic: bool = True) -> Array:
        x = TabularEmbedder(self.categories, self.num_continuous, self.dim,
                            self.num_special_tokens, name="embed")(
            x_categ, x_numer)
        x = jnp.concatenate([x, feature_img], axis=1)
        x = FTTransformerEncoder(
            self.depth, self.heads, self.dim_head, self.attn_dropout,
            self.ff_dropout, name="transformer",
        )(x, deterministic=deterministic)
        x = x[:, 0:1]
        if image_condition is not None:
            cond = flatten_volume_condition([image_condition])
            x = CrossAttention(self.heads, self.dim, name="final_cross")(
                x, cond) + x
            x = FeedForward(self.cross_ff_multi, self.ff_dropout,
                            name="final_feed")(
                x, deterministic=deterministic) + x
        x = x[:, 0]
        return LogitsHead(self.dim_out, name="to_logits")(x)


class FTTransformerCrossImg(_TabularCrossBase):
    """CLS cross-attends the image once, ReLU head
    (corss_ft_transformer.py:406-521)."""

    @nn.compact
    def __call__(self, x_categ: Array, x_numer: Array, feature_img: Array,
                 image_condition: Array | None = None, *,
                 deterministic: bool = True) -> Array:
        x = TabularEmbedder(self.categories, self.num_continuous, self.dim,
                            self.num_special_tokens, name="embed")(
            x_categ, x_numer)
        x = jnp.concatenate([x, feature_img], axis=1)
        x = FTTransformerEncoder(
            self.depth, self.heads, self.dim_head, self.attn_dropout,
            self.ff_dropout, name="transformer",
        )(x, deterministic=deterministic)
        x = x[:, 0:1]
        cond = flatten_volume_condition([image_condition])
        x = CrossAttention(self.heads, self.dim, name="final_cross")(x, cond)
        x = x[:, 0]
        return LogitsHead(self.dim_out, relu=True, name="to_logits")(x)


class FTTransformer(_TabularCrossBase):
    """Plain FT-Transformer tabular classifier (role of the external
    tab_transformer_pytorch used by the reference's table-only baselines,
    table/FT_table.py + FT_table_dataloader.py:7,23-33): embed -> encoder
    -> CLS -> LN+ReLU+Linear."""

    @nn.compact
    def __call__(self, x_categ: Array, x_numer: Array, *,
                 deterministic: bool = True) -> Array:
        x = TabularEmbedder(self.categories, self.num_continuous, self.dim,
                            self.num_special_tokens, name="embed")(
            x_categ, x_numer)
        x = FTTransformerEncoder(
            self.depth, self.heads, self.dim_head, self.attn_dropout,
            self.ff_dropout, name="transformer",
        )(x, deterministic=deterministic)
        return LogitsHead(self.dim_out, relu=True, name="to_logits")(x[:, 0])


class FTTransformerCross(_TabularCrossBase):
    """Tabular-only tokens with per-layer cross-attention conditioning
    (corss_ft_transformer.py:524-637)."""

    @nn.compact
    def __call__(self, x_categ: Array, x_numer: Array, condition: Array, *,
                 deterministic: bool = True, return_attn: bool = False):
        x = TabularEmbedder(self.categories, self.num_continuous, self.dim,
                            self.num_special_tokens, name="embed")(
            x_categ, x_numer)
        out = TransformerCross(
            self.depth, self.heads, self.dim_head, self.attn_dropout,
            self.ff_dropout, name="transformer",
        )(x, condition, deterministic=deterministic, return_attn=return_attn)
        if return_attn:
            x, attns = out
        else:
            x = out
        x = x[:, 0]
        logits = LogitsHead(self.dim_out, relu=True, name="to_logits")(x)
        if return_attn:
            return logits, attns
        return logits
