"""Round-3 simple/1D/token-surgery ViT zoo members (vit_zoo_simple.py):
forward shapes plus the reference-semantics spot checks (patch-dropout
subsetting, SPT shifts, LSA temperature, patch-merger pooling,
position-table quirks)."""

import jax
import jax.numpy as jnp
import numpy as np

from gfe_mamba_tpu.models.vit import ViTTransformer
from gfe_mamba_tpu.models.vit_zoo_simple import (
    EfficientViT,
    LocalViT,
    ParallelViT,
    PatchMerger,
    SimpleFlashAttnViT,
    SimpleViT1D,
    SimpleViTFFT,
    SimpleViTPatchDropout,
    SimpleViTQKNorm,
    SimpleViTRegisterTokens,
    ViT1D,
    ViTForSmallDataset,
    ViTPatchDropout,
    ViTWithPatchMerger,
    _patch_dropout,
    _posemb_sincos_1d,
    _SPT,
)


def _init_apply(model, x, train=False):
    v = model.init(jax.random.key(0), x)
    if train:
        return v, model.apply(v, x, deterministic=False,
                              rngs={"dropout": jax.random.key(1)})
    return v, model.apply(v, x)


def test_1d_members():
    s = jnp.linspace(0, 1, 2 * 32 * 2).reshape(2, 32, 2)
    _, o1 = _init_apply(SimpleViT1D(seq_len=32, patch_size=4, num_classes=3,
                                    dim=32, depth=1, heads=2, mlp_dim=48), s)
    assert o1.shape == (2, 3)
    _, o2 = _init_apply(ViT1D(seq_len=32, patch_size=4, num_classes=3,
                              dim=32, depth=1, heads=2, mlp_dim=48), s)
    assert o2.shape == (2, 3)
    # simple_vit_1d.py:9-19: first half sin, second half cos, omega
    # denominator (dim//2 - 1) so the last frequency is 1/temperature
    pe = np.asarray(_posemb_sincos_1d(8, 32))
    assert pe.shape == (8, 32)
    np.testing.assert_allclose(pe[0, :16], 0.0, atol=1e-7)
    np.testing.assert_allclose(pe[0, 16:], 1.0, atol=1e-7)
    np.testing.assert_allclose(pe[1, 15], np.sin(1e-4), atol=1e-7)


def test_patch_dropout_subsets_tokens():
    x = jnp.arange(2 * 8 * 4, dtype=jnp.float32).reshape(2, 8, 4)
    out = _patch_dropout(x, 0.5, jax.random.key(0))
    assert out.shape == (2, 4, 4)  # max(1, int(8 * 0.5))
    # every kept token is one of the input tokens, unmodified
    for b in range(2):
        rows = {tuple(np.asarray(r)) for r in x[b]}
        for r in np.asarray(out[b]):
            assert tuple(r) in rows
    # prob=0.9 keeps max(1, int(8*0.1)) = 1 token
    assert _patch_dropout(x, 0.9, jax.random.key(0)).shape == (2, 1, 4)


def test_patch_dropout_vits():
    img = jnp.ones((2, 16, 16, 3))
    m = SimpleViTPatchDropout(image_size=16, patch_size=4, num_classes=3,
                              dim=32, depth=1, heads=2, mlp_dim=48)
    _, out = _init_apply(m, img, train=True)
    assert out.shape == (2, 3)

    m2 = ViTPatchDropout(image_size=16, patch_size=4, num_classes=3,
                         dim=32, depth=1, heads=2, mlp_dim=48)
    v2, out2 = _init_apply(m2, img, train=True)
    assert out2.shape == (2, 3)
    # vit_with_patch_dropout.py:113: the position table has NO CLS row
    assert v2["params"]["pos_embedding"].shape == (16, 32)


def test_qk_norm_gamma_init():
    m = SimpleViTQKNorm(image_size=16, patch_size=4, num_classes=3, dim=32,
                        depth=1, heads=2, mlp_dim=48, dim_head=16)
    v, out = _init_apply(m, jnp.ones((2, 16, 16, 3)))
    assert out.shape == (2, 3)
    # simple_vit_with_qk_norm.py:33: gamma initialised to 1/sqrt(dim)
    g = v["params"]["attn_0"]["q_gamma"]
    np.testing.assert_allclose(np.asarray(g), 16 ** -0.5, atol=1e-6)


def test_register_tokens_pooling():
    m = SimpleViTRegisterTokens(image_size=16, patch_size=4, num_classes=3,
                                dim=32, depth=1, heads=2, mlp_dim=48,
                                num_register_tokens=3)
    v, out = _init_apply(m, jnp.ones((2, 16, 16, 3)))
    assert out.shape == (2, 3)
    assert v["params"]["register_tokens"].shape == (3, 32)


def test_fft_member():
    m = SimpleViTFFT(image_size=16, patch_size=4, freq_patch_size=4,
                     num_classes=3, dim=32, depth=1, heads=2, mlp_dim=48)
    x = jnp.linspace(0, 1, 2 * 16 * 16 * 3).reshape(2, 16, 16, 3)
    _, out = _init_apply(m, x)
    assert out.shape == (2, 3) and np.all(np.isfinite(np.asarray(out)))


def test_patch_merger():
    pm = PatchMerger(dim=16, num_tokens_out=4)
    x = jnp.linspace(0, 1, 2 * 10 * 16).reshape(2, 10, 16)
    v = pm.init(jax.random.key(0), x)
    out = pm.apply(v, x)
    assert out.shape == (2, 4, 16)

    m = ViTWithPatchMerger(image_size=16, patch_size=4, num_classes=3,
                           dim=32, depth=2, heads=2, mlp_dim=48,
                           patch_merge_num_tokens=4)
    vm, om = _init_apply(m, jnp.ones((2, 16, 16, 3)))
    assert om.shape == (2, 3)
    # vit_with_patch_merger.py:125: table keeps the unused extra row
    assert vm["params"]["pos_embedding"].shape == (1, 17, 32)


def test_spt_shifts():
    img = jnp.zeros((1, 3, 3, 1)).at[0, 1, 1, 0].set(1.0)
    spt = _SPT(dim=8, patch_size=3)
    v = spt.init(jax.random.key(0), img)

    # probe the stacking before patchify by reading the kernel input dim
    assert v["params"]["proj"]["kernel"].shape == (3 * 3 * 5 * 1, 8)

    m = ViTForSmallDataset(image_size=16, patch_size=4, num_classes=3,
                           dim=32, depth=1, heads=2, mlp_dim=48)
    vv, out = _init_apply(m, jnp.ones((2, 16, 16, 3)))
    assert out.shape == (2, 3)
    # vit_for_small_dataset.py:35: learned log temperature, scalar,
    # init log(dim_head^-0.5)
    t = vv["params"]["attn_0"]["temperature"]
    np.testing.assert_allclose(np.asarray(t), np.log(64 ** -0.5), atol=1e-6)


def test_parallel_vit_branches():
    m = ParallelViT(image_size=16, patch_size=4, num_classes=3, dim=32,
                    depth=1, heads=2, mlp_dim=48, num_parallel_branches=2)
    v, out = _init_apply(m, jnp.ones((2, 16, 16, 3)))
    assert out.shape == (2, 3)
    names = str(jax.tree_util.tree_structure(v))
    assert "attn_0_0" in names and "attn_0_1" in names
    assert "ff_0_0" in names and "ff_0_1" in names


def test_local_vit():
    m = LocalViT(image_size=16, patch_size=4, num_classes=3, dim=32,
                 depth=1, heads=2, mlp_dim=48)
    _, out = _init_apply(m, jnp.ones((2, 16, 16, 3)))
    assert out.shape == (2, 3)


def test_efficient_vit_pluggable_backbone():
    m = EfficientViT(image_size=16, patch_size=4, num_classes=3, dim=32,
                     transformer=ViTTransformer(1, 2, 16, 48))
    _, out = _init_apply(m, jnp.ones((2, 16, 16, 3)))
    assert out.shape == (2, 3)


def test_flash_attn_vit_matches_softmax_attention():
    m = SimpleFlashAttnViT(image_size=16, patch_size=4, num_classes=3,
                           dim=32, depth=1, heads=2, mlp_dim=48, dim_head=16)
    x = jnp.linspace(0, 1, 2 * 16 * 16 * 3).reshape(2, 16, 16, 3)
    v, out = _init_apply(m, x)
    assert out.shape == (2, 3)
    # jax.nn.dot_product_attention == explicit softmax attention
    q = jnp.linspace(-1, 1, 2 * 5 * 2 * 4).reshape(2, 5, 2, 4)
    ref = jnp.einsum(
        "bhij,bjhd->bihd",
        jax.nn.softmax(jnp.einsum("bihd,bjhd->bhij", q, q) * 4 ** -0.5),
        q)
    np.testing.assert_allclose(
        np.asarray(jax.nn.dot_product_attention(q, q, q)), np.asarray(ref),
        atol=1e-5)
