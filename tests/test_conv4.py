"""Space-to-depth k4s2 conv (ops/conv4.py) parity with the direct conv
and PatchDiscriminator(s2d=True) equivalence (same params, same output,
same init stream)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfe_mamba_tpu.models.discriminator import PatchDiscriminator
from gfe_mamba_tpu.ops.conv4 import can_use_s2d, conv_k4s2_s2d


def _direct(x, w, b):
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (2, 2, 2), [(1, 1)] * 3,
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))
    return out if b is None else out + b.astype(out.dtype)


@pytest.mark.parametrize("shape,F", [
    ((1, 8, 8, 4, 1), 8),
    ((2, 10, 6, 8, 5), 7),
    ((1, 16, 16, 8, 32), 64),
])
def test_s2d_matches_direct_conv(shape, F):
    k = jax.random.PRNGKey(0)
    C = shape[-1]
    x = jax.random.normal(k, shape, jnp.float32)
    w = jax.random.normal(jax.random.fold_in(k, 1), (4, 4, 4, C, F)) * 0.1
    b = jax.random.normal(jax.random.fold_in(k, 2), (F,))
    got = conv_k4s2_s2d(x, w, b)
    ref = _direct(x, w, b)
    assert got.shape == ref.shape == (
        shape[0], shape[1] // 2, shape[2] // 2, shape[3] // 2, F)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_s2d_grad_matches_direct_conv():
    k = jax.random.PRNGKey(3)
    x = jax.random.normal(k, (1, 8, 6, 4, 3), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(k, 1), (4, 4, 4, 3, 5)) * 0.1

    def loss(fn, x, w):
        return jnp.sum(fn(x, w, None) ** 2)

    gx1, gw1 = jax.grad(lambda x, w: loss(conv_k4s2_s2d, x, w), (0, 1))(x, w)
    gx2, gw2 = jax.grad(lambda x, w: loss(_direct, x, w), (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               rtol=1e-4, atol=1e-5)


def test_can_use_s2d_gates():
    assert can_use_s2d((1, 8, 8, 4, 1), 4, (2, 2, 2), [(1, 1)] * 3)
    assert not can_use_s2d((1, 7, 8, 4, 1), 4, (2, 2, 2), [(1, 1)] * 3)
    assert not can_use_s2d((1, 8, 8, 4, 1), 3, (2, 2, 2), [(1, 1)] * 3)
    assert not can_use_s2d((1, 8, 8, 4, 1), 4, (1, 1, 1), [(1, 1)] * 3)
    assert not can_use_s2d((1, 8, 8, 4, 1), 4, (2, 2, 2),
                           [(1, 1), (1, 2), (1, 1)])
    assert not can_use_s2d((1, 2, 8, 4, 1), 4, (2, 2, 2), [(1, 1)] * 3)


def test_patch_discriminator_s2d_equivalence():
    """Same init stream, same param tree, same outputs (all feature
    levels) at a canonical-like even geometry."""
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 16, 16, 8, 1))
    base = PatchDiscriminator(num_layers_d=2, num_channels=4)
    fast = PatchDiscriminator(num_layers_d=2, num_channels=4, s2d=True)
    p_base = base.init(jax.random.PRNGKey(11), x)
    p_fast = fast.init(jax.random.PRNGKey(11), x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), p_base, p_fast)
    outs_base = base.apply(p_base, x)
    outs_fast = fast.apply(p_base, x)
    assert len(outs_base) == len(outs_fast)
    for ob, of in zip(outs_base, outs_fast):
        np.testing.assert_allclose(np.asarray(of), np.asarray(ob),
                                   rtol=2e-5, atol=2e-5)


def test_patch_discriminator_s2d_odd_geometry_falls_back():
    """Odd spatial dims route every layer through nn.Conv -- identical
    trees and outputs, no crash."""
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 9, 9, 5, 1))
    base = PatchDiscriminator(num_layers_d=2, num_channels=4)
    fast = PatchDiscriminator(num_layers_d=2, num_channels=4, s2d=True)
    p = base.init(jax.random.PRNGKey(1), x)
    outs_base = base.apply(p, x)
    outs_fast = fast.apply(p, x)
    for ob, of in zip(outs_base, outs_fast):
        np.testing.assert_allclose(np.asarray(of), np.asarray(ob),
                                   rtol=1e-6, atol=1e-6)
