"""Feature combiners: generator features -> classifier token sequences.

Re-implements classify/classifier.py.  The live-path combiner is
``CombineClassifierVitMid`` (classifier.py:324-333): concat the ViT
bottleneck input/output along channels, flatten the 2D map, and project
H*W -> seq_length, yielding ``(B, seq_length, 2*C)`` tokens (with the
canonical config: (B, 4, 512)).

The legacy pyramid combiners (Combine_classfier_* , classifier.py:144-
370) pool encoder/decoder skip features through strided conv stacks;
``CombinePyramid`` reproduces their shared skeleton with the
stride-DSL ``StridedConv`` (SingleConv_modi, classifier.py:6-14).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from gfe_mamba_tpu.ops.blocks import SingleConv

Array = jnp.ndarray


class CombineClassifierVitMid(nn.Module):
    """(B,H,W,C) mid_input + mid_output -> (B, seq_length, 2C) tokens
    (classifier.py:324-333).  One (H*W x seq_length) matmul."""

    seq_length: int = 1

    @nn.compact
    def __call__(self, mid_input: Array, mid_output: Array) -> Array:
        x = jnp.concatenate([mid_input, mid_output], axis=-1)  # (B,H,W,2C)
        x = rearrange(x, "b h w c -> b c (h w)")
        x = nn.Dense(self.seq_length, name="vit_mid_linear")(x)  # (B,2C,S)
        return jnp.swapaxes(x, 1, 2)                             # (B,S,2C)


class PatchEmbed3D(nn.Module):
    """3D patch embedder (PatchEmbed/project, classifier.py:18-85):
    two-stage strided conv (conv+GELU+conv, each with half the patch
    stride) mapping a volume to a token sequence (B, N, dim)."""

    patch_size: int = 8
    dim: int = 512

    @nn.compact
    def __call__(self, x: Array) -> Array:
        import jax

        s = max(self.patch_size // 2, 1)
        x = nn.Conv(self.dim // 2, (s, s, s), strides=(s, s, s),
                    name="proj1")(x)
        x = nn.gelu(x)
        x = nn.Conv(self.dim, (2, 2, 2) if self.patch_size > 1 else (1, 1, 1),
                    strides=(2, 2, 2) if self.patch_size > 1 else (1, 1, 1),
                    name="proj2")(x)
        return rearrange(x, "b x y z c -> b (x y z) c")


class StridedConv(nn.Module):
    """SingleConv with stride (SingleConv_modi, classifier.py:6-14)."""

    out_channels: int
    kernel_size: int = 3
    order: str = "cge"
    num_groups: int = 8
    padding: int = 1
    stride: int = 1
    dims: int = 3

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        # conv with stride, then the remaining order chars
        import jax

        use_bias = not ("g" in self.order or "b" in self.order)
        for i, char in enumerate(self.order):
            if char == "c":
                x = nn.Conv(self.out_channels,
                            kernel_size=(self.kernel_size,) * self.dims,
                            strides=(self.stride,) * self.dims,
                            padding=[(self.padding, self.padding)] * self.dims,
                            use_bias=use_bias, name="conv")(x)
            elif char == "g":
                ch = x.shape[-1]
                groups = self.num_groups if ch >= self.num_groups else 1
                x = nn.GroupNorm(num_groups=groups, name=f"gn_{i}")(x)
            elif char == "e":
                x = jax.nn.elu(x)
            elif char == "r":
                x = jax.nn.relu(x)
            elif char == "l":
                x = jax.nn.leaky_relu(x)
        return x


def _pool(x: Array, window: int = 3, stride: int = 2, kind: str = "max") -> Array:
    dims = x.ndim - 2
    if any(d < window for d in x.shape[1:1 + dims]):
        # torch's MaxPool3d(3,2) raises here; XLA would silently emit a
        # zero-size tensor instead -- fail loudly with the same meaning.
        raise ValueError(
            f"pyramid pool window {window} exceeds spatial dims "
            f"{x.shape[1:1 + dims]}; combiner inputs are too small")
    w = (window,) * dims
    s = (stride,) * dims
    if kind == "max":
        return nn.max_pool(x, w, strides=s)
    return nn.avg_pool(x, w, strides=s)


class _PyramidExtract(nn.Module):
    """Shared front of the legacy combiners (classifier.py:148-153 etc):
    per-scale strided convs over concatenated encoder+decoder skips."""

    latent_dim: int

    @nn.compact
    def __call__(self, encoders_feature, decoders_feature, *,
                 deterministic: bool = True):
        assert len(encoders_feature) == len(decoders_feature) == 2
        extract = [
            StridedConv(self.latent_dim, 3, "cge", 8, 1, stride=2,
                        name="extract_0"),
            StridedConv(self.latent_dim, 3, "cge", 8, 1, stride=1,
                        name="extract_1"),
        ]
        feats = []
        for en, de, mod in zip(encoders_feature, decoders_feature, extract):
            feats.append(mod(jnp.concatenate([en, de], axis=-1),
                             deterministic=deterministic))
        return jnp.concatenate(feats, axis=-1)       # (B, ..., 2*latent)


class CombineClassifier(nn.Module):
    """Combine_classfier (classifier.py:144-182): pyramid -> flatten ->
    Linear -> scalar logit."""

    latent_dim: int = 16

    @nn.compact
    def __call__(self, encoders_feature, decoders_feature, *,
                 deterministic: bool = True) -> Array:
        whole = _PyramidExtract(self.latent_dim, name="extract")(
            encoders_feature, decoders_feature, deterministic=deterministic)
        x = _pool(whole)
        x = _pool(StridedConv(self.latent_dim, 1, "cge", 8, 0,
                              name="feature3_conv")(x))
        x = _pool(StridedConv(self.latent_dim, 1, "cge", 8, 0,
                              name="feature4_conv")(x))
        x = StridedConv(self.latent_dim, 1, "cge", 8, 0,
                        name="feature5_conv")(x)
        x = _pool(x, kind="avg")
        flat = x.reshape(x.shape[0], -1)
        return nn.Dense(1, name="fully_con")(flat)


class CombineClassifierCross(nn.Module):
    """Combine_classfier_cross (classifier.py:186-225): padded pyramid ->
    (B, latent, voxels) condition tokens for cross-attention."""

    latent_dim: int = 16

    @nn.compact
    def __call__(self, encoders_feature, decoders_feature, *,
                 deterministic: bool = True) -> Array:
        whole = _PyramidExtract(self.latent_dim, name="extract")(
            encoders_feature, decoders_feature, deterministic=deterministic)

        def padded_pool(x):
            dims = x.ndim - 2
            return nn.max_pool(x, (3,) * dims, strides=(2,) * dims,
                               padding=[(1, 1)] * dims)

        x = padded_pool(whole)
        x = padded_pool(StridedConv(self.latent_dim, 1, "cge", 8, 0,
                                    name="feature3_conv")(x))
        x = padded_pool(StridedConv(self.latent_dim, 1, "cge", 8, 0,
                                    name="feature4_conv")(x))
        return rearrange(x, "b x y z c -> b c (x y z)")


class CombineClassifierEmb(nn.Module):
    """Combine_classfier_emb (classifier.py:229-250): pyramid extract ->
    3D patch embedding -> token sequence."""

    latent_dim: int = 16
    patch_size: int = 16
    embed_dim: int = 512

    @nn.compact
    def __call__(self, encoders_feature, decoders_feature, *,
                 deterministic: bool = True) -> Array:
        whole = _PyramidExtract(self.latent_dim, name="extract")(
            encoders_feature, decoders_feature, deterministic=deterministic)
        return PatchEmbed3D(self.patch_size, self.embed_dim,
                            name="patch_embbeder")(whole)


class CombineClassifierFused(nn.Module):
    """Combine_classfier_ (classifier.py:253-295): pyramid descriptor
    concatenated with an external FT feature -> scalar logit."""

    latent_dim: int = 16

    @nn.compact
    def __call__(self, encoders_feature, decoders_feature, ft_feature, *,
                 deterministic: bool = True) -> Array:
        whole = _PyramidExtract(self.latent_dim, name="extract")(
            encoders_feature, decoders_feature, deterministic=deterministic)
        x = _pool(whole)
        x = _pool(StridedConv(self.latent_dim, 1, "cge", 8, 0,
                              name="feature3_conv")(x))
        x = _pool(StridedConv(self.latent_dim, 1, "cge", 8, 0,
                              name="feature4_conv")(x))
        x = StridedConv(self.latent_dim, 1, "cge", 8, 0,
                        name="feature5_conv")(x)
        x = _pool(x, kind="avg")
        b = x.shape[0]
        feats = x.reshape(b, 1, -1)
        combined = jnp.concatenate([feats, ft_feature], axis=1).reshape(b, -1)
        return nn.Dense(1, name="fully_con")(combined)


class CombineClassifier2(nn.Module):
    """Combine_classfier_2 (classifier.py:286-325): pyramid extract ->
    constant-width (latent_dim) pooled conv pyramid -> single flattened
    descriptor token ``(B, 1, latent_dim * voxels)``."""

    latent_dim: int = 16

    @nn.compact
    def __call__(self, encoders_feature: Sequence[Array],
                 decoders_feature: Sequence[Array], *,
                 deterministic: bool = True) -> Array:
        whole = _PyramidExtract(self.latent_dim, name="extract")(
            encoders_feature, decoders_feature, deterministic=deterministic)
        whole = _pool(whole)
        f3 = _pool(StridedConv(self.latent_dim, 1, "cge", 8, 0,
                               name="feature3_conv")(whole))
        f4 = _pool(StridedConv(self.latent_dim, 1, "cge", 8, 0,
                               name="feature4_conv")(f3))
        f5 = _pool(StridedConv(self.latent_dim, 1, "cge", 8, 0,
                               name="feature5_conv")(f4), kind="avg")
        return f5.reshape(f5.shape[0], 1, -1)


class CombineClassifier3(nn.Module):
    """Combine_classfier_3 (classifier.py:336-370): per-scale strided
    convs over concatenated encoder+decoder features, widening pooled
    conv pyramid (latent*2 -> latent*4), flattened to a voxel-token
    sequence ``(B, voxels, latent_dim * 4)``."""

    latent_dim: int = 128
    f_maps: Sequence[int] = (64, 128, 256)

    @nn.compact
    def __call__(self, encoders_feature: Sequence[Array],
                 decoders_feature: Sequence[Array], *,
                 deterministic: bool = True) -> Array:
        whole = _PyramidExtract(self.latent_dim, name="extract")(
            encoders_feature, decoders_feature, deterministic=deterministic)
        whole = _pool(whole)
        f3 = _pool(StridedConv(self.latent_dim * 2, 1, "cge", 8, 0,
                               name="feature3_conv")(whole))
        f4 = _pool(StridedConv(self.latent_dim * 4, 1, "cge", 8, 0,
                               name="feature4_conv")(f3))
        f5 = _pool(StridedConv(self.latent_dim * 4, 1, "cge", 8, 0,
                               name="feature5_conv")(f4), kind="avg")
        return rearrange(f5, "b x y z c -> b (x y z) c")


# Backwards-compatible alias: round-1 shipped Combine_classfier_3's
# skeleton under this name.
CombinePyramid = CombineClassifier3
