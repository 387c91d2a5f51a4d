"""Self/cross attention blocks (reference cross_atten/sd_cross_atten.py).

``CrossAttention`` is the pixel-level fusion op of GFE-Mamba
(sd_cross_atten.py:39-70): queries from the pooled sequence embedding
(d_embed=512), keys/values projected from flattened volume slices
(d_cross = 160*160 = 25600 per slice token).  The K/V projections are
(25600 x 512) matmuls over 192 slice tokens -- large, MXU-friendly, and
the natural tensor-parallel shard point of the classifier.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

Array = jax.Array


class SelfAttention(nn.Module):
    """Fused-qkv multi-head self-attention with optional causal mask
    (sd_cross_atten.py:7-37)."""

    n_heads: int
    in_proj_bias: bool = True
    out_proj_bias: bool = True

    @nn.compact
    def __call__(self, x: Array, *, causal_mask: bool = False) -> Array:
        d_embed = x.shape[-1]
        d_head = d_embed // self.n_heads
        qkv = nn.Dense(3 * d_embed, use_bias=self.in_proj_bias,
                       name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (rearrange(t, "b n (h d) -> b h n d", h=self.n_heads)
                   for t in (q, k, v))
        logits = jnp.einsum("bhid,bhjd->bhij", q, k) / jnp.sqrt(d_head)
        if causal_mask:
            n = x.shape[1]
            mask = jnp.tril(jnp.ones((n, n), bool))
            logits = jnp.where(mask, logits, -jnp.inf)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = rearrange(out, "b h n d -> b n (h d)")
        return nn.Dense(d_embed, use_bias=self.out_proj_bias,
                        name="out_proj")(out)


class CrossAttention(nn.Module):
    """Q from ``x`` (d_embed), K/V from ``y`` (d_cross -> d_embed)
    (sd_cross_atten.py:39-70)."""

    n_heads: int
    d_embed: int
    in_proj_bias: bool = True
    out_proj_bias: bool = True

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        d_head = self.d_embed // self.n_heads
        q = nn.Dense(self.d_embed, use_bias=self.in_proj_bias, name="q_proj")(x)
        k = nn.Dense(self.d_embed, use_bias=self.in_proj_bias, name="k_proj")(y)
        v = nn.Dense(self.d_embed, use_bias=self.in_proj_bias, name="v_proj")(y)
        q, k, v = (rearrange(t, "b n (h d) -> b h n d", h=self.n_heads)
                   for t in (q, k, v))
        logits = jnp.einsum("bhid,bhjd->bhij", q, k) / jnp.sqrt(d_head)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = rearrange(out, "b h n d -> b n (h d)")
        return nn.Dense(self.d_embed, use_bias=self.out_proj_bias,
                        name="out_proj")(out)
