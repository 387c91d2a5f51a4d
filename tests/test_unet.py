"""UNet zoo + GAN-ViT generator tests at CPU-friendly sizes, plus a
golden parameter-count parity check against the torch reference."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfe_mamba_tpu.models import (
    UNet3D, ResidualUNet3D, ResidualUNetSE3D, UNet2D,
    ResidualMidUNet3D, ResidualMidUNet3DViT, get_model,
)
from gfe_mamba_tpu.models.unet3d import fold_3d_to_2d, unfold_2d_to_3d

TINY_GEN = dict(
    f_maps=(8, 16, 32), fold_factor=2, vit_patch_size=8, vit_dim=32,
    vit_depth=1, vit_heads=2, vit_mlp_dim=64,
)


def test_fold_roundtrip_matches_reference_order():
    """The depth-fold rearrange (model.py:150-152) must round-trip and
    lay tokens out exactly like the reference einops pattern."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 8, 4, 6, 3), jnp.float32)  # (b, m1*m2, h, w, c)
    folded = fold_3d_to_2d(x, 2)
    assert folded.shape == (2, 4 * 2, 4 * 6, 3)  # (b, h*m1, m2*w, c)
    back = unfold_2d_to_3d(folded, 2, w=6)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    # element check: output[h*m1 + ... ] mapping
    import einops
    expected = einops.rearrange(
        np.asarray(x), "b (m1 m2) h w c -> b (h m1) (m2 w) c", m1=2
    )
    np.testing.assert_array_equal(np.asarray(folded), expected)


def test_unet3d_forward():
    model = UNet3D(1, 2, f_maps=8, num_levels=3, is_segmentation=False)
    x = jnp.ones((1, 16, 16, 8, 1))
    params = model.init(jax.random.key(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 16, 16, 8, 2)


def test_residual_unet3d_forward():
    model = ResidualUNet3D(1, 1, f_maps=8, num_levels=3, is_segmentation=False,
                           layer_order="cge")
    x = jnp.ones((1, 16, 16, 8, 1))
    y = model.apply(model.init(jax.random.key(0), x), x)
    assert y.shape == (1, 16, 16, 8, 1)


def test_residual_unet_se3d_forward():
    model = ResidualUNetSE3D(1, 1, f_maps=8, num_levels=2,
                             is_segmentation=False, layer_order="cge")
    x = jnp.ones((1, 8, 8, 8, 1))
    y = model.apply(model.init(jax.random.key(0), x), x)
    assert y.shape == (1, 8, 8, 8, 1)


def test_unet2d_forward():
    model = UNet2D(1, 3, f_maps=8, num_levels=3, is_segmentation=False)
    x = jnp.ones((1, 16, 16, 1))
    y = model.apply(model.init(jax.random.key(0), x), x)
    assert y.shape == (1, 16, 16, 3)


def test_segmentation_sigmoid_only_in_eval():
    model = UNet3D(1, 1, f_maps=8, num_levels=2, is_segmentation=True,
                   final_sigmoid=True)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 8, 1), np.float32)
    params = model.init(jax.random.key(0), x)
    y_eval = model.apply(params, x)
    assert float(y_eval.min()) >= 0.0 and float(y_eval.max()) <= 1.0
    y_train = model.apply(params, x, train=True,
                          rngs={"dropout": jax.random.key(1)})
    assert float(y_train.min()) < 0.0 or float(y_train.max()) > 1.0


def test_mid_unet_output_mid():
    model = ResidualMidUNet3D(1, 1, f_maps=(8, 16, 32), layer_order="cge",
                              is_segmentation=False)
    x = jnp.ones((1, 16, 16, 8, 1))
    params = model.init(jax.random.key(0), x)
    enc_feats, dec_feats, out = model.apply(params, x, output_mid=True)
    assert out.shape == (1, 16, 16, 8, 1)
    # reversed ordering pairs same-resolution encoder/decoder features
    assert len(enc_feats) == len(dec_feats) == 2
    assert enc_feats[0].shape == (1, 16, 16, 8, 8)
    assert dec_feats[0].shape == (1, 16, 16, 8, 8)
    assert enc_feats[1].shape == (1, 8, 8, 4, 16)
    assert dec_feats[1].shape == (1, 8, 8, 4, 16)


def test_generator_vit_mid_outputs():
    """Scaled-down Residual_mid_UNet3D_vit: output_vit_mid returns the
    2D ViT bottleneck input/output plus the generated volume."""
    model = ResidualMidUNet3DViT(1, 1, is_segmentation=False,
                                 layer_order="cge", **TINY_GEN)
    x = jnp.ones((1, 32, 32, 16, 1))
    params = model.init(jax.random.key(0), x)
    mid_in, mid_out, pet = model.apply(params, x, output_vit_mid=True)
    # bottleneck (8,8,4,32) folds with m1=2 -> (8*2, 2*4... ) = (16,16,32)
    assert mid_in.shape == (1, 16, 16, 32)
    assert mid_out.shape == (1, 16, 16, 32)
    assert pet.shape == (1, 32, 32, 16, 1)


def test_generator_canonical_shapes_via_eval_shape():
    """Canonical 160x160x96 generator: verify the documented internal
    shapes without running compute (jax.eval_shape)."""
    model = ResidualMidUNet3DViT(1, 1, is_segmentation=False, f_maps=(64, 128, 256))
    x = jax.ShapeDtypeStruct((1, 160, 160, 96, 1), jnp.float32)
    variables = jax.eval_shape(model.init, jax.random.key(0), x)
    # ViT patch embedding: (40*40*256, 512) -- the big MXU matmul
    k = variables["params"]["mid"]["patch_embed"]["kernel"]
    assert k.shape == (40 * 40 * 256, 512)
    pos = variables["params"]["mid"]["pos_embedding"]
    assert pos.shape == (1, 8 * 3 + 1, 512)

    out = jax.eval_shape(
        lambda v, xx: model.apply(v, xx, output_vit_mid=True), variables, x
    )
    mid_in, mid_out, pet = out
    assert mid_in.shape == (1, 320, 120, 256)
    assert mid_out.shape == (1, 320, 120, 256)
    assert pet.shape == (1, 160, 160, 96, 1)


def test_get_model_factory():
    model = get_model({"name": "UNet3D", "in_channels": 1, "out_channels": 2,
                       "f_maps": 8, "num_levels": 2})
    assert model.out_channels == 2
    with pytest.raises(ValueError):
        get_model({"name": "NoSuchNet"})


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference not mounted")
def test_param_count_parity_with_reference():
    """Golden check: identical trainable-parameter count to the torch
    reference generator Residual_mid_UNet3D_vit(1,1,f_maps=(64,128,256))
    (main_gan_vit.py:32)."""
    torch = pytest.importorskip("torch")
    # the reference's vendored vit zoo imports torchvision (absent here)
    # at package-import time; satisfy it with an empty stub
    import types
    for mod in ("torchvision", "torchvision.transforms"):
        sys.modules.setdefault(mod, types.ModuleType(mod))
    sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
    sys.path.insert(0, "/root/reference")
    try:
        from pytorch3dunet.unet3d.model import Residual_mid_UNet3D_vit
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference import failed: {exc}")
    finally:
        sys.path.remove("/root/reference")

    ref = Residual_mid_UNet3D_vit(1, 1, is_segmentation=False,
                                  f_maps=(64, 128, 256))
    ref_count = sum(p.numel() for p in ref.parameters())
    # reference has a dead mid_linear(960->1024) layer (model.py:119)
    dead = sum(p.numel() for p in ref.mid_linear.parameters())

    model = ResidualMidUNet3DViT(1, 1, is_segmentation=False,
                                 f_maps=(64, 128, 256))
    x = jax.ShapeDtypeStruct((1, 160, 160, 96, 1), jnp.float32)
    variables = jax.eval_shape(model.init, jax.random.key(0), x)
    ours = sum(int(np.prod(l.shape))
               for l in jax.tree_util.tree_leaves(variables["params"]))
    assert ours == ref_count - dead


def test_packed_flow_declines_nondivisible_xy():
    """X/Y not divisible by 2^(levels-1) must fall back to the unpacked
    path (whose decoder resizes to the skip shape) instead of engaging
    the packed octant decoder, whose sum-join has no resize
    (round-3 regression: the gate only checked z)."""
    model = ResidualUNet3D(1, 1, f_maps=(64, 128, 256), layer_order="cge",
                           is_segmentation=False, conv_impl="fused")
    x = jnp.zeros((1, 18, 18, 16, 1))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 18, 18, 16, 1)
