"""Fused GN+conv3d+act kernel (ops/pallas/conv3d.py) correctness.

The kernel itself runs in Pallas interpret mode on CPU; the module
integration (SingleConv/ResNetBlock/UNet with conv_impl='fused') is
checked for param-tree identity and numerical parity against the
nn.GroupNorm/nn.Conv path (on CPU the fused op dispatches to its XLA
twin, which exercises the folded-GN math and the custom_vjp).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfe_mamba_tpu.ops.blocks import ResNetBlock, SingleConv
from gfe_mamba_tpu.ops.pallas.conv3d import (
    _conv3x3x3_fused, _reference_impl, conv3x3x3, fused_gn_conv_act,
    group_norm_stats)


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(jax.random.key(key), shape, dtype)


@pytest.mark.parametrize("shape,feat", [
    ((1, 16, 16, 8, 8), 8),
    ((2, 10, 12, 8, 16), 8),     # non-divisible X/Y -> cdiv grid + crop
    ((1, 8, 8, 16, 4), 12),
])
@pytest.mark.parametrize("act", ["none", "relu", "elu"])
def test_kernel_interpret_matches_xla(shape, feat, act):
    x = _rand(0, shape)
    w = _rand(1, (3, 3, 3, shape[-1], feat)) * 0.2
    bias = _rand(2, (feat,)) * 0.1
    a = 1.0 + 0.1 * _rand(3, (shape[0], shape[-1]))
    b = 0.1 * _rand(4, (shape[0], shape[-1]))
    got = _conv3x3x3_fused(x, w, bias, a, b, act=act, xt=4, yt=4,
                           interpret=True)
    want = _reference_impl(x, w, bias, a, b, act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_kernel_interpret_no_bias_no_affine():
    x = _rand(0, (1, 8, 8, 8, 8))
    w = _rand(1, (3, 3, 3, 8, 8)) * 0.2
    got = _conv3x3x3_fused(x, w, None, None, None, act="none", xt=4, yt=4,
                           interpret=True)
    want = _reference_impl(x, w, None, None, None, "none")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_fused_gn_conv_act_matches_flax_groupnorm_conv():
    """The folded GN affine must reproduce nn.GroupNorm -> nn.Conv ->
    act exactly (same stats, eps, param application)."""
    import flax.linen as nn

    C, F = 16, 8
    x = _rand(0, (2, 6, 6, 4, C))
    gamma = 1.0 + 0.2 * _rand(1, (C,))
    beta = 0.1 * _rand(2, (C,))
    w = _rand(3, (3, 3, 3, C, F)) * 0.2

    got = fused_gn_conv_act(x, num_groups=4, gamma=gamma, beta=beta, w=w,
                            bias=None, act="relu")

    gn = nn.GroupNorm(num_groups=4, epsilon=1e-5)
    y = gn.apply({"params": {"scale": gamma, "bias": beta}}, x)
    want = jax.nn.relu(jax.lax.conv_general_dilated(
        y, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC")))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_custom_vjp_grads_match_reference():
    x = _rand(0, (1, 6, 6, 4, 8))
    w = _rand(1, (3, 3, 3, 8, 8)) * 0.2
    a = 1.0 + 0.1 * _rand(2, (1, 8))
    b = 0.1 * _rand(3, (1, 8))

    def loss_fused(x, w, a, b):
        return jnp.sum(conv3x3x3(x, w, None, a, b, "elu") ** 2)

    def loss_ref(x, w, a, b):
        return jnp.sum(_reference_impl(x, w, None, a, b, "elu") ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w, a, b)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, a, b)
    for a_, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_singleconv_param_tree_identical_and_parity():
    x = _rand(0, (2, 8, 8, 4, 6))
    for order in ("gcr", "cge", "gc", "cr", "gce"):
        m_x = SingleConv(8, order=order, num_groups=2, conv_impl="xla")
        m_f = SingleConv(8, order=order, num_groups=2, conv_impl="fused")
        p_x = m_x.init(jax.random.key(1), x)
        p_f = m_f.init(jax.random.key(1), x)
        sx = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), p_x)
        sf = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), p_f)
        assert jax.tree_util.tree_structure(sx) == \
            jax.tree_util.tree_structure(sf), order
        assert jax.tree_util.tree_all(
            jax.tree_util.tree_map(lambda a, b: a == b, sx, sf)), order
        # same init seed -> identical params -> identical output
        out_x = m_x.apply(p_x, x)
        out_f = m_f.apply(p_f, x)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                                   atol=1e-5, rtol=1e-5, err_msg=order)


def test_resnetblock_fused_parity_and_grads():
    x = _rand(0, (1, 8, 8, 4, 4))
    m_x = ResNetBlock(8, order="gcr", num_groups=2, conv_impl="xla")
    m_f = ResNetBlock(8, order="gcr", num_groups=2, conv_impl="fused")
    p = m_x.init(jax.random.key(2), x)
    np.testing.assert_allclose(
        np.asarray(m_f.apply(p, x)), np.asarray(m_x.apply(p, x)),
        atol=1e-5, rtol=1e-5)

    def loss(params, m):
        return jnp.sum(m.apply(params, x) ** 2)

    gx = jax.grad(loss)(p, m_x)
    gf = jax.grad(loss)(p, m_f)
    # E[x^2]-mu^2 vs E[(x-mu)^2] GN-stats formulations differ at the
    # ~1e-4 level in f32 gradients
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3), gx, gf)


def test_group_norm_stats_match_flax():
    import flax.linen as nn
    x = _rand(0, (2, 5, 5, 3, 8))
    mu, rstd = group_norm_stats(x, 4)
    gn = nn.GroupNorm(num_groups=4, epsilon=1e-5, use_scale=False,
                      use_bias=False)
    want = gn.apply({}, x)
    got = (x - mu[:, None, None, None, :]) * rstd[:, None, None, None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_unet_fused_parity():
    """Full tiny-UNet forward: conv_impl='fused' (XLA twin on CPU,
    incl. DotConv1x1 shortcut/final paths) vs the nn.Conv path."""
    from gfe_mamba_tpu.models.unet3d import UNet

    x = _rand(0, (1, 8, 8, 4, 1))
    kw = dict(out_channels=1, basic_module="ResNetBlock",
              f_maps=(4, 8), layer_order="gcr", num_groups=2,
              is_segmentation=False)
    m_x = UNet(conv_impl="xla", **kw)
    m_f = UNet(conv_impl="fused", **kw)
    p = m_x.init(jax.random.key(0), x)
    p2 = m_f.init(jax.random.key(0), x)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p2)
    np.testing.assert_allclose(
        np.asarray(m_f.apply(p, x)), np.asarray(m_x.apply(p, x)),
        atol=1e-5, rtol=1e-5)


def test_unet_remat_parity_forward_and_grads():
    """remat=True must not change values or grads (only memory)."""
    from gfe_mamba_tpu.models.unet3d import UNet

    x = _rand(0, (1, 8, 8, 4, 1))
    kw = dict(out_channels=1, basic_module="ResNetBlock", f_maps=(4, 8),
              layer_order="gcr", num_groups=2, is_segmentation=False)
    m = UNet(remat=False, **kw)
    mr = UNet(remat=True, **kw)
    p = m.init(jax.random.key(0), x)
    np.testing.assert_allclose(np.asarray(mr.apply(p, x)),
                               np.asarray(m.apply(p, x)), atol=1e-6)

    def loss(params, mod):
        return jnp.sum(mod.apply(params, x) ** 2)

    g = jax.grad(loss)(p, m)
    gr = jax.grad(loss)(p, mr)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5), g, gr)


# ---------------------------------------------------------------------------
# Packed-domain path (round 3): z-pair packed IO between blocks
# ---------------------------------------------------------------------------

def test_packed_ops_match_unpacked():
    from gfe_mamba_tpu.ops.pallas.conv3d import (
        avg_pool_packed, group_norm_stats_p, max_pool_packed, pack_z,
        unpack_z)
    import flax.linen as nn

    x = _rand(0, (2, 8, 8, 8, 64))
    mu, rstd = group_norm_stats(x, 8)
    mu2, rstd2 = group_norm_stats_p(pack_z(x), 8)
    np.testing.assert_allclose(np.asarray(mu2), np.asarray(mu),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rstd2), np.asarray(rstd),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(unpack_z(max_pool_packed(pack_z(x)))),
        np.asarray(nn.max_pool(x, (2, 2, 2), (2, 2, 2))), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(unpack_z(avg_pool_packed(pack_z(x)))),
        np.asarray(nn.avg_pool(x, (2, 2, 2), (2, 2, 2))),
        rtol=1e-5, atol=1e-5)


def test_conv3x3x3_p_residual_epilogue_fwd_and_grads():
    """The flagship conv3 shape: act none + residual + post_act, packed
    IO, against the XLA composition (values and grads)."""
    from gfe_mamba_tpu.ops.pallas.conv3d import conv3x3x3_p, pack_z, unpack_z

    x = _rand(0, (2, 8, 8, 8, 64))
    w = _rand(1, (3, 3, 3, 64, 64)) * 0.05
    res = _rand(2, (2, 8, 8, 8, 64))
    mu, rstd = group_norm_stats(x, 8)
    a, b = rstd, -mu * rstd

    got = unpack_z(conv3x3x3_p(pack_z(x), w, None, a, b, pack_z(res),
                               "none", "relu"))
    want = jax.nn.relu(_reference_impl(x, w, None, a, b, "none") + res)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    def f_p(x, w, res):
        return jnp.mean(conv3x3x3_p(pack_z(x), w, None, a, b,
                                    pack_z(res), "none", "relu") ** 2)

    def f_r(x, w, res):
        return jnp.mean(jax.nn.relu(
            _reference_impl(x, w, None, a, b, "none") + res) ** 2)

    gp = jax.grad(f_p, (0, 1, 2))(x, w, res)
    gr = jax.grad(f_r, (0, 1, 2))(x, w, res)
    for a1, a2 in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                                   rtol=1e-3, atol=1e-5)


def test_conv3x3x3_p_rejects_act_with_epilogue():
    from gfe_mamba_tpu.ops.pallas.conv3d import conv3x3x3_p, pack_z

    x = _rand(0, (1, 8, 8, 8, 64))
    w = _rand(1, (3, 3, 3, 64, 64))
    with pytest.raises(ValueError):
        conv3x3x3_p(pack_z(x), w, None, None, None, pack_z(x),
                    "relu", "relu")


def test_packed_kernel_interpret_residual():
    """Pallas kernel (interpret mode) with the fused residual+post_act
    epilogue vs the XLA composition."""
    from gfe_mamba_tpu.ops.pallas.conv3d import _conv3x3x3_fused_p, pack_z, \
        unpack_z

    x = _rand(0, (1, 8, 8, 8, 64))
    w = _rand(1, (3, 3, 3, 64, 64)) * 0.05
    res = _rand(2, (1, 8, 8, 8, 64))
    mu, rstd = group_norm_stats(x, 8)
    a, b = rstd, -mu * rstd
    got = unpack_z(_conv3x3x3_fused_p(
        pack_z(x), w, None, a, b, pack_z(res), act="none", post_act="elu",
        xt=4, yt=4, interpret=True))
    want = jax.nn.elu(_reference_impl(x, w, None, a, b, "none") + res)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-3)


def test_packed_unet_parity_forward_vitmid_grads():
    """Full flagship-shaped UNet with the packed flow active (f_maps all
    %64, fused impl) vs the nn.Conv path: forward, output_vit_mid
    triple, and gradients (relative tolerance -- the huge-K dw dots
    differ only by f32 reduction order)."""
    from gfe_mamba_tpu.models.unet3d import ResidualMidUNet3DViT

    kw = dict(f_maps=(64, 128), is_segmentation=False, fold_factor=2,
              vit_patch_size=4, vit_dim=32, vit_depth=1, vit_heads=2,
              vit_mlp_dim=32)
    m_x = ResidualMidUNet3DViT(1, 1, conv_impl="xla", **kw)
    m_p = ResidualMidUNet3DViT(1, 1, conv_impl="fused", **kw)
    x = _rand(0, (2, 16, 16, 8, 1))
    params = m_x.init(jax.random.key(0), x)
    p2 = m_p.init(jax.random.key(0), x)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))

    np.testing.assert_allclose(np.asarray(m_p.apply(params, x)),
                               np.asarray(m_x.apply(params, x)),
                               rtol=2e-4, atol=2e-4)
    for a, b in zip(m_p.apply(params, x, output_vit_mid=True),
                    m_x.apply(params, x, output_vit_mid=True)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)

    def loss(m):
        return lambda p: jnp.mean(m.apply(p, x) ** 2)

    gx = jax.grad(loss(m_x))(params)
    gp = jax.grad(loss(m_p))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b),
            atol=5e-3 * (np.max(np.abs(a)) + 1e-3)), gx, gp)


def test_packed_unet_remat_parity():
    from gfe_mamba_tpu.models.unet3d import ResidualUNet3D

    kw = dict(f_maps=(64, 128), num_levels=2, is_segmentation=False)
    m = ResidualUNet3D(1, 1, conv_impl="fused", remat=False, **kw)
    mr = ResidualUNet3D(1, 1, conv_impl="fused", remat=True, **kw)
    x = _rand(0, (1, 8, 8, 8, 1))
    p = m.init(jax.random.key(0), x)
    np.testing.assert_allclose(np.asarray(mr.apply(p, x)),
                               np.asarray(m.apply(p, x)), atol=1e-6)
    # grads under jax.checkpoint (regression: a traced reduce_window
    # init value broke linearization inside remat)
    g = jax.grad(lambda p: jnp.sum(m.apply(p, x) ** 2))(p)
    gr = jax.grad(lambda p: jnp.sum(mr.apply(p, x) ** 2))(p)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5), g, gr)


@pytest.mark.parametrize("split", [True, False, "aligned"])
def test_kernel_interpret_split_staging_modes(split):
    """All staging layouts of the packed kernel -- split (center 2C
    dotted straight from the slab, edges staged), lane-aligned split
    (edge stores keep their source lane offsets; weight edge rows
    swapped to match), and full-4C -- must match the XLA twin, plain
    and with the residual epilogue."""
    from gfe_mamba_tpu.ops.pallas.conv3d import (_conv3x3x3_fused_p,
                                                 pack_z, unpack_z)

    x = _rand(0, (1, 8, 8, 8, 16))
    w = _rand(1, (3, 3, 3, 16, 8)) * 0.1
    bias = _rand(2, (8,)) * 0.1
    a = 1.0 + 0.1 * _rand(3, (1, 16))
    b = 0.1 * _rand(4, (1, 16))
    got = unpack_z(_conv3x3x3_fused_p(pack_z(x), w, bias, a, b,
                                      act="relu", xt=4, yt=4,
                                      interpret=True, split=split))
    want = _reference_impl(x, w, bias, a, b, "relu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

    res = _rand(5, (1, 8, 8, 8, 8))
    got = unpack_z(_conv3x3x3_fused_p(pack_z(x), w, bias, a, b,
                                      pack_z(res), act="none",
                                      post_act="elu", xt=4, yt=4,
                                      interpret=True, split=split))
    want = jax.nn.elu(_reference_impl(x, w, bias, a, b, "none") + res)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_dw_pallas_kernel_interpret_matches_unpacked_reference():
    """The Pallas weight-gradient kernel (one VMEM-resident pass over
    the packed operands) must reproduce the direct unpacked dw
    convolution: dw[i,j,k,c,f] = sum_bxyz zhat[x+i-1,y+j-1,z+k-1,c]
    * g1[x,y,z,f].  Covers a non-divisible spatial geometry (cdiv grid
    + zero-padded tails) and the dispatch-eligible lane widths."""
    from gfe_mamba_tpu.ops.pallas.conv3d import (_dw_pallas_p,
                                                 _dw_pick_tiles, unpack_z)

    B, X, Y, ZH, C, F = 1, 6, 10, 5, 64, 64
    C2, F2 = 2 * C, 2 * F
    z = 0.1 * _rand(0, (B, X, Y, ZH, C2))
    g1 = 0.1 * _rand(1, (B, X, Y, ZH, F2))

    zu = np.asarray(unpack_z(z))
    gu = np.asarray(unpack_z(g1))
    zp = np.pad(zu, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    Z2 = 2 * ZH
    ref = np.zeros((3, 3, 3, C, F), np.float32)
    for i in range(3):
        for j in range(3):
            for k in range(3):
                ref[i, j, k] = np.einsum(
                    "bxyzc,bxyzf->cf",
                    zp[:, i:i + X, j:j + Y, k:k + Z2, :], gu)

    xt, yt = _dw_pick_tiles(ZH, C2, F2, 4)
    got = np.asarray(_dw_pallas_p(z, g1, xt=xt, yt=yt, interpret=True))
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=3e-4)
