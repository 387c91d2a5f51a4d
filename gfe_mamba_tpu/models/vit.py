"""Image-to-image ViT bottleneck (channels-last, TPU-native).

Re-implements the project-modified ViT of the reference
(vit_pytorch_diy/vit.py:83-137): a standard pre-norm ViT encoder plus a
``from_patch_embedding`` head (vit.py:102-110) that

  LayerNorm -> token-mixing Linear(num_patches+1 -> num_patches, which
  drops the CLS token) -> Linear(dim -> patch_dim) -> LayerNorm ->
  un-patchify

turning the ViT into an image-to-image operator usable as a UNet
bottleneck.  Patches flatten as ``(p1 p2 c)`` to keep the same element
order as the reference (enables future weight import).

The big matmuls here -- patch embed (p*p*C x dim) and its inverse -- are
exactly MXU-shaped; attention over the handful of bottleneck tokens is
negligible next to them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

Array = jax.Array


class ViTAttention(nn.Module):
    """Pre-norm multi-head self-attention (vit.py:29-63)."""

    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        dim = x.shape[-1]
        inner = self.heads * self.dim_head
        project_out = not (self.heads == 1 and self.dim_head == dim)

        x = nn.LayerNorm(name="norm")(x)
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (
            rearrange(t, "b n (h d) -> b h n d", h=self.heads) for t in (q, k, v)
        )
        attn = jax.nn.softmax(
            jnp.einsum("bhid,bhjd->bhij", q, k) * self.dim_head ** -0.5, axis=-1
        )
        # sown for vit_zoo_final.record_attention (recorder.py's hook on
        # `attend`); a no-op unless 'intermediates' is mutable
        self.sow("intermediates", "attn", attn)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = rearrange(out, "b h n d -> b n (h d)")
        if project_out:
            out = nn.Dense(dim, name="to_out")(out)
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class ViTFeedForward(nn.Module):
    """LN -> Dense -> GELU -> Dropout -> Dense -> Dropout (vit.py:14-27)."""

    hidden_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        dim = x.shape[-1]
        x = nn.LayerNorm()(x)
        x = nn.Dense(self.hidden_dim)(x)
        x = nn.gelu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(dim)(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class ViTTransformer(nn.Module):
    """Residual attention/FF stack with a final LayerNorm (vit.py:65-81)."""

    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        for i in range(self.depth):
            x = ViTAttention(
                self.heads, self.dim_head, self.dropout, name=f"attn_{i}"
            )(x, deterministic=deterministic) + x
            x = ViTFeedForward(
                self.mlp_dim, self.dropout, name=f"ff_{i}"
            )(x, deterministic=deterministic) + x
        return nn.LayerNorm(name="norm")(x)


class ImageToImageViT(nn.Module):
    """ViT that maps a 2D feature image to a same-shaped feature image.

    Reference defaults for the GAN-ViT bottleneck (model.py:107-117):
    patch 40 over a (320, 120) 256-channel image -> 24 tokens of dim 512.
    The patch-embedding Linear (409600 x 512) dominates the parameter
    count; it is a single large MXU matmul per call.
    """

    patch_size: int = 40
    dim: int = 512
    depth: int = 4
    heads: int = 6
    mlp_dim: int = 2048
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0

    @nn.compact
    def __call__(self, img: Array, *, deterministic: bool = True) -> Array:
        b, height, width, channels = img.shape
        p = self.patch_size
        assert height % p == 0 and width % p == 0, (
            f"image dims {(height, width)} must be divisible by patch {p}"
        )
        h, w = height // p, width // p
        num_patches = h * w
        patch_dim = channels * p * p

        # to_patch_embedding (vit.py:95-100)
        x = rearrange(img, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)", p1=p, p2=p)
        x = nn.LayerNorm(name="patch_norm_in")(x)
        x = nn.Dense(self.dim, name="patch_embed")(x)
        x = nn.LayerNorm(name="patch_norm_out")(x)

        cls_token = self.param(
            "cls_token", nn.initializers.normal(1.0), (1, 1, self.dim)
        )
        pos_embedding = self.param(
            "pos_embedding", nn.initializers.normal(1.0),
            (1, num_patches + 1, self.dim),
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (b, 1, self.dim)), x], axis=1
        )
        x = x + pos_embedding
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)

        x = ViTTransformer(
            self.depth, self.heads, self.dim_head, self.mlp_dim, self.dropout,
            name="transformer",
        )(x, deterministic=deterministic)

        # from_patch_embedding (vit.py:102-110): token-mixing linear drops CLS
        x = nn.LayerNorm(name="out_norm_tokens")(x)
        x = jnp.swapaxes(x, 1, 2)               # (b, dim, n+1)
        x = nn.Dense(num_patches, name="token_mix")(x)
        x = jnp.swapaxes(x, 1, 2)               # (b, n, dim)
        x = nn.Dense(patch_dim, name="patch_unembed")(x)
        x = nn.LayerNorm(name="out_norm_patch")(x)
        x = rearrange(
            x, "b (h w) (p1 p2 c) -> b (h p1) (w p2) c", h=h, w=w, p1=p, p2=p
        )
        return x
