"""Multimodal Mamba/Jamba fusion classifiers (Stage-2 heads).

Re-implements reference cross_atten/mamba_transformer.py:
``Cross_mamba_both`` (l.11-133), ``Cross_jamba_both`` (l.135-251) and
``Cross_mamba_ablation`` (l.254-385):

  FT-style tabular embedding (offset categorical + affine numerical +
  CLS) ++ generator feature tokens -> sequence mixer (Mamba / Jamba) ->
  mean-pool -> pixel-level cross-attention over flattened [MRI, PET]
  volumes -> GEGLU FeedForward -> LayerNorm+Linear logit head.

Deviation from the reference, by design (SURVEY.md 3.3): the mixer
output is mean-pooled (mamba_transformer.py:122) and the image
condition is always the intended ``[MRI, generated PET]`` pair; the
reference test_mamba.py quirk of passing the batch tensor alone is not
reproduced.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from gfe_mamba_tpu.models.attention import CrossAttention
from gfe_mamba_tpu.models.ft_transformer import (
    FeedForward,
    LogitsHead,
    TabularEmbedder,
    flatten_volume_condition,
)
from gfe_mamba_tpu.models.mamba import Mamba, MambaConfig

Array = jnp.ndarray


class _FusionBase(nn.Module):
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
    scan_mode: str = "associative"

    def _embed_tokens(self, x_categ, x_numer, feature_img):
        x = TabularEmbedder(self.categories, self.num_continuous, self.dim,
                            self.num_special_tokens, name="embed")(
            x_categ, x_numer)
        if feature_img is not None:
            x = jnp.concatenate([x, feature_img], axis=1)
        return x

    def _fuse_head(self, x, image_condition, deterministic):
        # mean-pool the mixed sequence (mamba_transformer.py:122)
        x = jnp.mean(x, axis=1, keepdims=True)
        if image_condition is not None:
            cond = flatten_volume_condition(image_condition)
            x = CrossAttention(self.heads, self.dim, name="final_cross")(
                x, cond) + x
            x = FeedForward(self.cross_ff_multi, self.cross_ff_dropout,
                            name="final_feed")(
                x, deterministic=deterministic) + x
        x = x[:, 0]
        return LogitsHead(self.dim_out, name="to_logits")(x)


class CrossMambaBoth(_FusionBase):
    """The GFE-Mamba classifier head (mamba_transformer.py:11-133)."""

    @nn.compact
    def __call__(self, x_categ: Array, x_numer: Array, feature_img: Array,
                 image_condition: Sequence[Array] | None = None, *,
                 deterministic: bool = True) -> Array:
        x = self._embed_tokens(x_categ, x_numer, feature_img)
        mixer = Mamba(MambaConfig(d_model=self.dim, n_layers=self.depth,
                                  scan_mode=self.scan_mode),
                      name="transformer")
        x = mixer(x)
        return self._fuse_head(x, image_condition, deterministic)


class CrossJambaBoth(_FusionBase):
    """Jamba-mixer variant (mamba_transformer.py:135-251): interleaved
    attention/Mamba layers with MoE -- n_layers = 2*depth."""

    num_experts: int = 16
    num_experts_per_tok: int = 2

    @nn.compact
    def __call__(self, x_categ: Array, x_numer: Array, feature_img: Array,
                 image_condition: Sequence[Array] | None = None, *,
                 deterministic: bool = True) -> Array:
        from gfe_mamba_tpu.models.jamba import Jamba, JambaConfig

        x = self._embed_tokens(x_categ, x_numer, feature_img)
        mixer = Jamba(JambaConfig(
            d_model=self.dim, n_layers=2 * self.depth,
            mlp_size=self.dim * 2,
            num_attention_heads=self.heads,
            attention_dropout=self.attn_dropout,
            num_experts=self.num_experts,
            num_experts_per_tok=self.num_experts_per_tok,
            scan_mode=self.scan_mode,
        ), name="transformer")
        x, _router_logits = mixer(x, deterministic=deterministic)
        return self._fuse_head(x, image_condition, deterministic)


class CrossMambaAblation(_FusionBase):
    """Ablation harness (mamba_transformer.py:254-385): optional
    no-table / no-image-feature / no-pixel-condition paths."""

    @nn.compact
    def __call__(self, x_categ: Array, x_numer: Array,
                 feature_img: Array | None = None,
                 image_condition: Sequence[Array] | None = None, *,
                 no_table: bool = False, deterministic: bool = True) -> Array:
        table = TabularEmbedder(self.categories, self.num_continuous,
                                self.dim, self.num_special_tokens,
                                name="embed")(x_categ, x_numer)
        cls, table_tokens = table[:, :1], table[:, 1:]
        if no_table:
            assert feature_img is not None
            x = jnp.concatenate([cls, feature_img], axis=1)
        elif feature_img is not None:
            x = jnp.concatenate([cls, table_tokens, feature_img], axis=1)
        else:
            x = jnp.concatenate([cls, table_tokens], axis=1)
        mixer = Mamba(MambaConfig(d_model=self.dim, n_layers=self.depth,
                                  scan_mode=self.scan_mode),
                      name="transformer")
        x = mixer(x)
        return self._fuse_head(x, image_condition, deterministic)
