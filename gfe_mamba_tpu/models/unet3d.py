"""UNet model zoo + the GAN-ViT generator (channels-last, TPU-native).

Re-implements the reference zoo (pytorch3dunet/unet3d/model.py):
``UNet3D``, ``ResidualUNet3D``, ``ResidualUNetSE3D``, ``UNet2D``,
``ResidualUNet2D`` (model.py:281-461), the mid-feature variants
``Residual_mid_UNet3D`` (model.py:333) and the flagship Stage-1
generator ``Residual_mid_UNet3D_vit`` (model.py:308) with its
depth-fold 3D->2D ViT bottleneck (model.py:137-175), plus the
``get_model`` reflection factory (model.py:466-470).

Architecture of the flagship (reference call stack SURVEY.md 3.4):
input (B,160,160,96,1) -> enc1 (no pool, 64ch) -> enc2 (pool2, 128ch)
-> enc3 (pool2, 256ch) = (B,40,40,24,256) -> depth-fold
'b (m1 m2) h w c -> b (h m1) (m2 w) c', m1=8 -> (B,320,120,256) ->
image-to-image ViT (patch 40, dim 512, depth 4) -> unfold -> dec x2
(deconv + summation join) -> final 1x1x1 conv -> PET (B,160,160,96,1).

All modules take channels-last volumes and stage Python-level control
flow (output_mid / output_vit_mid / train) out of the jitted graph as
static arguments.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from gfe_mamba_tpu.ops.blocks import (
    DotConv1x1, make_decoder_stack, make_encoder_stack, resolve_conv_impl)
from gfe_mamba_tpu.ops.pallas.conv3d import pack_z, unpack_z
from gfe_mamba_tpu.models.vit import ImageToImageViT

Array = jax.Array


def number_of_features_per_level(init_channels: int, num_levels: int) -> list[int]:
    """[c, 2c, 4c, ...] -- reference unet3d/utils.py."""
    return [init_channels * 2 ** k for k in range(num_levels)]


def fold_3d_to_2d(x: Array, fold: int) -> Array:
    """Depth-fold the first spatial dim into a 2D feature image
    (model.py:150): ``b (m1 m2) h w c -> b (h m1) (m2 w) c``."""
    return rearrange(x, "b (m1 m2) h w c -> b (h m1) (m2 w) c", m1=fold)


def unfold_2d_to_3d(x: Array, fold: int, w: int) -> Array:
    """Inverse of :func:`fold_3d_to_2d` (model.py:152)."""
    return rearrange(x, "b (h m1) (m2 w) c -> b (m1 m2) h w c", m1=fold, w=w)


class UNet(nn.Module):
    """Generic encoder/decoder UNet with optional ViT mid-bottleneck.

    ``mid='none'`` reproduces AbstractUNet (model.py:177-278);
    ``mid='features'`` reproduces Mid_UNet (model.py:9-81);
    ``mid='vit'`` reproduces Mid_UNet_vit (model.py:83-175).
    """

    out_channels: int
    basic_module: str = "DoubleConv"
    f_maps: Sequence[int] = (64, 128, 256, 512)
    layer_order: str = "gcr"
    num_groups: int = 8
    is_segmentation: bool = True
    final_sigmoid: bool = True
    conv_kernel_size: int = 3
    pool_kernel_size: int = 2
    conv_padding: int = 1
    conv_upscale: int = 2
    upsample: str = "default"
    dropout_prob: float = 0.1
    dims: int = 3
    exact_reference_upsample: bool = False
    conv_impl: str = "auto"   # 'auto'|'xla'|'fused' (ops/blocks.py)
    # rematerialize each encoder/decoder block in the backward pass
    # (jax.checkpoint): residuals shrink to the block inputs/skips, so
    # full-resolution training fits HBM at batch >1
    remat: bool = False
    mid: str = "none"
    # ViT bottleneck settings (reference model.py:107-117)
    fold_factor: int = 8
    vit_patch_size: int = 40
    vit_dim: int = 512
    vit_depth: int = 4
    vit_heads: int = 6
    vit_mlp_dim: int = 2048
    vit_dropout: float = 0.1
    vit_emb_dropout: float = 0.1

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False,
                 output_mid: bool = False, output_vit_mid: bool = False):
        assert len(self.f_maps) > 1, "Required at least 2 levels in the U-Net"
        deterministic = not train

        # packed flow (round 3): every tensor between blocks is z-pair
        # packed (B, X, Y, Z//2, 2C) -- lane-full buffers kill the
        # (.., Z, 64) tile-pad/repack glue that dominated the step
        # (PERF_NOTES "Round 3: segment attribution")
        packed = (
            resolve_conv_impl(self.conv_impl, self.dims,
                              self.conv_kernel_size,
                              self.conv_padding) == "fused"
            and self.dims == 3
            and self.basic_module == "ResNetBlock"
            and set(self.layer_order) <= set("gcrle")
            and self.pool_kernel_size == 2
            and self.upsample in ("default", "deconv")
            and x.shape[3] % (2 ** len(self.f_maps)) == 0
            # the packed decoder sum-join has no skip-shape resize (the
            # octant deconv emits exactly 2x), so X/Y must pool/deconv
            # losslessly through every level; the unpacked path keeps
            # its _interpolate_to tolerance for odd shapes
            and x.shape[1] % (2 ** (len(self.f_maps) - 1)) == 0
            and x.shape[2] % (2 ** (len(self.f_maps) - 1)) == 0
            and all(f % 64 == 0 for f in self.f_maps)
        )

        encoders = make_encoder_stack(
            self.f_maps, self.basic_module, self.conv_kernel_size,
            self.conv_padding, self.conv_upscale, self.dropout_prob,
            self.layer_order, self.num_groups, self.pool_kernel_size,
            self.dims, conv_impl=self.conv_impl, packed_io=packed,
        )
        decoders = make_decoder_stack(
            self.f_maps, self.basic_module, self.conv_kernel_size,
            self.conv_padding, self.layer_order, self.num_groups,
            self.upsample, self.dropout_prob, self.dims,
            exact_reference_upsample=self.exact_reference_upsample,
            conv_impl=self.conv_impl, packed_io=packed,
        )
        if packed:
            x = pack_z(x)

        def _enc_fn(mdl, h):
            return mdl(h, deterministic=deterministic)

        def _dec_fn(mdl, skip, h):
            return mdl(skip, h, deterministic=deterministic)

        if self.remat:
            _enc_fn = nn.remat(_enc_fn)
            _dec_fn = nn.remat(_dec_fn)

        encoders_features: list[Array] = []
        for encoder in encoders:
            x = _enc_fn(encoder, x)
            encoders_features.insert(0, x)
        # drop the bottleneck feature; remaining are the skip connections
        skips = encoders_features[1:]

        mid_input = mid_output = None
        if self.mid == "vit":
            xu = unpack_z(x) if packed else x  # free bitcast at C=256
            mid_input = fold_3d_to_2d(xu, self.fold_factor)
            mid_output = ImageToImageViT(
                patch_size=self.vit_patch_size,
                dim=self.vit_dim,
                depth=self.vit_depth,
                heads=self.vit_heads,
                mlp_dim=self.vit_mlp_dim,
                dropout=self.vit_dropout,
                emb_dropout=self.vit_emb_dropout,
                name="mid",
            )(mid_input, deterministic=deterministic)
            x = unfold_2d_to_3d(mid_output, self.fold_factor, w=xu.shape[3])
            if packed:
                x = pack_z(x)

        decoders_features: list[Array] = []
        for decoder, skip in zip(decoders, skips):
            x = _dec_fn(decoder, skip, x)
            if output_mid:
                decoders_features.append(unpack_z(x) if packed else x)

        if packed:
            x = DotConv1x1(self.out_channels, self.dims, packed_io=True,
                           name="final_conv")(x)
            x = unpack_z(x)
        elif resolve_conv_impl(self.conv_impl, self.dims, 3,
                               self.conv_padding) == "fused":
            x = DotConv1x1(self.out_channels, self.dims,
                           name="final_conv")(x)
        else:
            x = nn.Conv(self.out_channels, (1,) * self.dims,
                        name="final_conv")(x)

        # final activation only outside training (model.py:273-276)
        if not train and self.is_segmentation:
            x = jax.nn.sigmoid(x) if self.final_sigmoid else jax.nn.softmax(x, axis=-1)

        if output_mid:
            skips = [unpack_z(s) for s in skips] if packed else skips
            skips.reverse()
            decoders_features.reverse()
            return skips, decoders_features, x
        if output_vit_mid:
            assert self.mid == "vit", "output_vit_mid requires mid='vit'"
            return mid_input, mid_output, x
        return x


# --------------------------------------------------------------------------
# Concrete zoo (thin factories mirroring model.py:281-461)
# --------------------------------------------------------------------------

def UNet3D(in_channels: int = 1, out_channels: int = 1, final_sigmoid: bool = True,
           f_maps: int | Sequence[int] = 64, layer_order: str = "gcr",
           num_groups: int = 8, num_levels: int = 4, is_segmentation: bool = True,
           **kwargs: Any) -> UNet:
    if isinstance(f_maps, int):
        f_maps = number_of_features_per_level(f_maps, num_levels)
    return UNet(out_channels=out_channels, basic_module="DoubleConv",
                f_maps=tuple(f_maps), layer_order=layer_order,
                num_groups=num_groups, is_segmentation=is_segmentation,
                final_sigmoid=final_sigmoid, dims=3,
                **_unet_kwargs(kwargs))


def ResidualUNet3D(in_channels: int = 1, out_channels: int = 1,
                   final_sigmoid: bool = True, f_maps: int | Sequence[int] = 64,
                   layer_order: str = "gcr", num_groups: int = 8,
                   num_levels: int = 5, is_segmentation: bool = True,
                   **kwargs: Any) -> UNet:
    if isinstance(f_maps, int):
        f_maps = number_of_features_per_level(f_maps, num_levels)
    return UNet(out_channels=out_channels, basic_module="ResNetBlock",
                f_maps=tuple(f_maps), layer_order=layer_order,
                num_groups=num_groups, is_segmentation=is_segmentation,
                final_sigmoid=final_sigmoid, dims=3,
                **_unet_kwargs(kwargs))


def ResidualUNetSE3D(in_channels: int = 1, out_channels: int = 1,
                     final_sigmoid: bool = True, f_maps: int | Sequence[int] = 64,
                     layer_order: str = "gcr", num_groups: int = 8,
                     num_levels: int = 5, is_segmentation: bool = True,
                     **kwargs: Any) -> UNet:
    if isinstance(f_maps, int):
        f_maps = number_of_features_per_level(f_maps, num_levels)
    return UNet(out_channels=out_channels, basic_module="ResNetBlockSE",
                f_maps=tuple(f_maps), layer_order=layer_order,
                num_groups=num_groups, is_segmentation=is_segmentation,
                final_sigmoid=final_sigmoid, dims=3,
                **_unet_kwargs(kwargs))


def UNet2D(in_channels: int = 1, out_channels: int = 1, final_sigmoid: bool = True,
           f_maps: int | Sequence[int] = 64, layer_order: str = "gcr",
           num_groups: int = 8, num_levels: int = 4, is_segmentation: bool = True,
           **kwargs: Any) -> UNet:
    if isinstance(f_maps, int):
        f_maps = number_of_features_per_level(f_maps, num_levels)
    return UNet(out_channels=out_channels, basic_module="DoubleConv",
                f_maps=tuple(f_maps), layer_order=layer_order,
                num_groups=num_groups, is_segmentation=is_segmentation,
                final_sigmoid=final_sigmoid, dims=2,
                **_unet_kwargs(kwargs))


def ResidualUNet2D(in_channels: int = 1, out_channels: int = 1,
                   final_sigmoid: bool = True, f_maps: int | Sequence[int] = 64,
                   layer_order: str = "gcr", num_groups: int = 8,
                   num_levels: int = 5, is_segmentation: bool = True,
                   **kwargs: Any) -> UNet:
    if isinstance(f_maps, int):
        f_maps = number_of_features_per_level(f_maps, num_levels)
    return UNet(out_channels=out_channels, basic_module="ResNetBlock",
                f_maps=tuple(f_maps), layer_order=layer_order,
                num_groups=num_groups, is_segmentation=is_segmentation,
                final_sigmoid=final_sigmoid, dims=2,
                **_unet_kwargs(kwargs))


def ResidualMidUNet3D(in_channels: int = 1, out_channels: int = 1,
                      final_sigmoid: bool = True,
                      f_maps: Sequence[int] = (64, 128, 256, 512),
                      layer_order: str = "gcr", num_groups: int = 8,
                      is_segmentation: bool = True, **kwargs: Any) -> UNet:
    """Residual_mid_UNet3D (model.py:333): exposes encoder/decoder skip
    features via ``output_mid=True``."""
    return UNet(out_channels=out_channels, basic_module="ResNetBlock",
                f_maps=tuple(f_maps), layer_order=layer_order,
                num_groups=num_groups, is_segmentation=is_segmentation,
                final_sigmoid=final_sigmoid, dims=3, mid="features",
                **_unet_kwargs(kwargs))


def ResidualMidUNet3DViT(in_channels: int = 1, out_channels: int = 1,
                         final_sigmoid: bool = True,
                         f_maps: Sequence[int] = (64, 128, 256),
                         layer_order: str = "gcr", num_groups: int = 8,
                         is_segmentation: bool = True, **kwargs: Any) -> UNet:
    """The Stage-1 MRI->PET generator, Residual_mid_UNet3D_vit
    (model.py:308).  ``output_vit_mid=True`` returns
    (mid_input, mid_output, pet) -- the generative features consumed by
    the Stage-2 classifier (model.py:172-173)."""
    return UNet(out_channels=out_channels, basic_module="ResNetBlock",
                f_maps=tuple(f_maps), layer_order=layer_order,
                num_groups=num_groups, is_segmentation=is_segmentation,
                final_sigmoid=final_sigmoid, dims=3, mid="vit",
                **_unet_kwargs(kwargs))


_UNET_FIELDS = {f for f in UNet.__dataclass_fields__}  # type: ignore[attr-defined]


def _unet_kwargs(kwargs: dict) -> dict:
    return {k: v for k, v in kwargs.items() if k in _UNET_FIELDS}


_MODEL_ZOO = {
    "UNet3D": UNet3D,
    "ResidualUNet3D": ResidualUNet3D,
    "ResidualUNetSE3D": ResidualUNetSE3D,
    "UNet2D": UNet2D,
    "ResidualUNet2D": ResidualUNet2D,
    "Residual_mid_UNet3D": ResidualMidUNet3D,
    "ResidualMidUNet3D": ResidualMidUNet3D,
    "Residual_mid_UNet3D_vit": ResidualMidUNet3DViT,
    "ResidualMidUNet3DViT": ResidualMidUNet3DViT,
}


def get_model(model_config: dict) -> UNet:
    """Reflection factory keyed by ``name`` (model.py:466-470); accepts
    both the reference's torch class names and the native ones."""
    cfg = dict(model_config)
    name = cfg.pop("name")
    try:
        factory = _MODEL_ZOO[name]
    except KeyError as exc:
        raise ValueError(
            f"unknown model {name!r}; available: {sorted(_MODEL_ZOO)}"
        ) from exc
    return factory(**cfg)
