"""MVCS baseline network (reference cross_atten/Ours.py).

Multi-View Channel-Spatial attention classifier used as a comparison
baseline: per-slice SSA (pixel attention + channel attention aggregated,
then temporal attention across slices, Ours.py:15-69), three-axis
multi-view SADA attention with pairwise cross-view attention
(Ours.py:72-124), MVCS conv blocks (Ours.py:126-190) and a pooled
classification head (MVCSNet, Ours.py:205-258).

Channels-last (B, D, H, W, C); the reference's torch MultiheadAttention
calls on 5D tensors are ill-typed -- here cross-view attention runs over
flattened voxel tokens per view, which is the evident intent.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

Array = jax.Array


def _instance_norm(x: Array, name_scope: nn.Module, name: str) -> Array:
    return nn.GroupNorm(num_groups=None, group_size=1, name=name)(x)


class SSA(nn.Module):
    """Spatial (pixel+channel) attention per slice, then temporal
    attention across the slice axis (Ours.py:15-69).

    Input: (B, T, H, W, C) -- T is the slice ('segment') axis."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, t, h, w, c = x.shape
        flat = x.reshape(b * t, h, w, c)
        qkv = nn.Conv(3 * c, (1, 1), name="to_qkv")(flat)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (rearrange(m, "bt h w c -> bt (h w) c") for m in (q, k, v))
        scale = c ** -0.5

        pixel_attn = jax.nn.softmax(
            jnp.einsum("bic,bjc->bij", q, k) * scale, axis=-1)
        pixel_out = jnp.einsum("bij,bjd->bid", pixel_attn, v)

        chan_attn = jax.nn.softmax(
            jnp.einsum("bic,bik->bck", q, k) * scale, axis=-1)
        chan_out = jnp.einsum("bij,bdj->bdi", chan_attn, v)

        x_hat = rearrange(pixel_out + chan_out,
                          "(b t) (h w) c -> b t h w c", t=t, h=h)

        # temporal attention: qk from a (3,1,1) conv over the slice axis
        t_qk = nn.Conv(2 * c, (3, 1, 1), padding=[(1, 1), (0, 0), (0, 0)],
                       name="to_temporal_qk")(x_hat)
        tq, tk = jnp.split(t_qk, 2, axis=-1)
        tq = rearrange(tq, "b t h w c -> b t (c h w)")
        tk = rearrange(tk, "b t h w c -> b t (c h w)")
        tv = rearrange(v, "(b t) hw c -> b t (hw c)", t=t)
        attn = jax.nn.softmax(jnp.einsum("bid,bjd->bij", tq, tk), axis=-1)
        out = jnp.einsum("bkt,btd->bkd", attn, tv)
        return rearrange(out, "b t (h w c) -> b t h w c", h=h, w=w)


class CrossViewAttention(nn.Module):
    """Multi-head attention between two views' pooled slice tokens."""

    heads: int = 4
    dropout: float = 0.2

    @nn.compact
    def __call__(self, q_view: Array, kv_view: Array, *,
                 deterministic: bool = True) -> Array:
        b = q_view.shape[0]
        c = q_view.shape[-1]
        # tokens = per-slice spatial means (keeps attention O(T^2))
        q_tok = jnp.mean(q_view, axis=(2, 3))      # (B, T, C)
        kv_tok = jnp.mean(kv_view, axis=(2, 3))
        d_head = max(c // self.heads, 1)
        q = nn.Dense(self.heads * d_head, name="q")(q_tok)
        k = nn.Dense(self.heads * d_head, name="k")(kv_tok)
        v = nn.Dense(self.heads * d_head, name="v")(kv_tok)
        q, k, v = (rearrange(m, "b t (h d) -> b h t d", h=self.heads)
                   for m in (q, k, v))
        attn = jax.nn.softmax(
            jnp.einsum("bhid,bhjd->bhij", q, k) / jnp.sqrt(d_head), axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = rearrange(out, "b h t d -> b t (h d)")
        out = nn.Dense(c, name="out")(out)
        # broadcast the token update back over the spatial dims
        return out[:, :, None, None, :]


class SADAAttention(nn.Module):
    """Three-axis SSA + pairwise cross-view fusion (Ours.py:72-124)."""

    heads: int = 4
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        # x: (B, D, H, W, C); views slice along D / H / W respectively
        x0 = SSA(name="LF0")(x)
        x1 = jnp.moveaxis(
            SSA(name="LF1")(jnp.moveaxis(x, 2, 1)), 1, 2)
        x2 = jnp.moveaxis(
            SSA(name="LF2")(jnp.moveaxis(x, 3, 1)), 1, 3)

        def attn(name, q, kv):
            return CrossViewAttention(self.heads, self.dropout, name=name)(
                q, kv, deterministic=deterministic)

        x0 = attn("a01", x0, x1) + x0 + attn("a02", x0, x2)
        x1 = attn("a10", x1, x0) + x1 + attn("a12", x1, x2)
        x2 = attn("a20", x2, x1) + x2 + attn("a21", x2, x1)
        return x0 + x1 + x2


class MVCSBlock(nn.Module):
    """1x1 conv -> optional SADA -> 3x3 conv (Ours.py:126-166)."""

    out_channels: int
    heads: int
    atten: bool

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        x = nn.Conv(self.out_channels, (1, 1, 1), use_bias=False,
                    name="conv0")(x)
        x = _instance_norm(x, self, "norm0")
        x = nn.gelu(x)
        if self.atten:
            x = SADAAttention(self.heads, name="sada")(
                x, deterministic=deterministic)
        x = nn.Conv(self.out_channels, (3, 3, 3), padding=1, use_bias=False,
                    name="conv2")(x)
        x = _instance_norm(x, self, "norm2")
        return nn.gelu(x)


class MVCSBlocks(nn.Module):
    """Two MVCSBlocks with a 1x1 residual shortcut (Ours.py:169-190)."""

    out_channels: int
    heads: int
    atten: Sequence[bool] = (False, False)
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        residual = nn.Conv(self.out_channels, (1, 1, 1), use_bias=False,
                           name="shortcut")(x)
        residual = _instance_norm(residual, self, "shortcut_norm")
        residual = nn.gelu(residual)
        h = MVCSBlock(self.out_channels, self.heads, self.atten[0],
                      name="block0")(x, deterministic=deterministic)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = MVCSBlock(self.out_channels, self.heads, self.atten[1],
                      name="block1")(h, deterministic=deterministic)
        return h + residual


class MVCSNet(nn.Module):
    """Full baseline classifier (Ours.py:205-258): input conv + pooled
    MVCS block pyramid + GAP + MLP head."""

    num_classes: int = 1
    base_channel: int = 64
    num_head: Sequence[int] = (16, 8, 4, 2)
    drop_rate: float = 0.2

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        bc = self.base_channel
        x = nn.Conv(bc, (3, 3, 3), padding=1, use_bias=False, name="input")(x)
        x = _instance_norm(x, self, "input_norm")
        x = nn.gelu(x)
        x = nn.avg_pool(x, (2, 2, 2), strides=(2, 2, 2))
        x = MVCSBlocks(bc * 2, self.num_head[0], (False, False),
                       name="conv0")(x, deterministic=deterministic)
        x = nn.avg_pool(x, (2, 2, 2), strides=(2, 2, 2))
        x = MVCSBlocks(bc * 4, self.num_head[1], (True, True),
                       name="conv1")(x, deterministic=deterministic)
        x = nn.avg_pool(x, (2, 2, 2), strides=(2, 2, 2))
        x = MVCSBlocks(bc * 8, self.num_head[2], (True, True),
                       name="conv2")(x, deterministic=deterministic)
        x = jnp.mean(x, axis=(1, 2, 3))           # GAP
        x = nn.Dense(bc * 4, name="head1")(x)
        x = nn.gelu(x)
        return nn.Dense(self.num_classes, name="head2")(x)
