"""Parity of the im2col stem lowering vs the packed XLA twin.

The C_in=1 stem (enc1's conv2, reference buildingblocks.py SingleConv
at f_maps[0]) dispatches to ``_stem_impl_p`` on TPU; these tests pin
it float-close to ``_reference_impl_p`` across acts, bias, GN folds,
residual epilogues, and odd extents.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfe_mamba_tpu.ops.pallas.conv3d import (
    _reference_impl_p, _stem_impl_p, pack_z)


def _mk(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


def _case(seed, B, X, Y, Z, F, *, bias=True, gn=True, act="none",
          residual=False, post_act="none", dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    xv = pack_z(_mk(ks[0], (B, X, Y, Z, 1), dtype))
    w = _mk(ks[1], (3, 3, 3, 1, F), dtype) * 0.3
    b = _mk(ks[2], (F,), dtype) if bias else None
    s = 1.0 + 0.1 * _mk(ks[3], (B, 1)) if gn else None
    t = 0.1 * _mk(ks[4], (B, 1)) if gn else None
    r = (pack_z(_mk(ks[5], (B, X, Y, Z, F), dtype)) if residual
         else None)
    ref = _reference_impl_p(xv, w, b, s, t, r, act, post_act)
    got = _stem_impl_p(xv, w, b, s, t, r, act, post_act)
    assert got.shape == ref.shape == (B, X, Y, Z // 2, 2 * F)
    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=tol, rtol=tol)


def test_plain():
    _case(0, 2, 8, 8, 8, 16, bias=True, gn=False)


def test_gn_fold_and_relu():
    _case(1, 2, 8, 8, 8, 16, bias=False, gn=True, act="relu")


@pytest.mark.parametrize("act", ["elu", "leaky001"])
def test_acts(act):
    _case(2, 1, 8, 8, 4, 8, act=act)


def test_residual_post_act():
    _case(3, 1, 8, 8, 4, 8, bias=False, residual=True, post_act="relu")


def test_odd_spatial_extents():
    # non-multiple-of-8 X/Y and minimal Z (one pair each side padded)
    _case(4, 1, 5, 7, 2, 8)


def test_bf16():
    _case(5, 2, 8, 8, 8, 64, act="relu", dtype=jnp.bfloat16)


def test_boundary_zero_padding():
    """A one-hot input at a corner exercises every pad face."""
    B, X, Y, Z, F = 1, 4, 4, 4, 8
    x = jnp.zeros((B, X, Y, Z, 1)).at[0, 0, 0, 0, 0].set(1.0)
    xv = pack_z(x)
    w = _mk(jax.random.PRNGKey(9), (3, 3, 3, 1, F)) * 0.5
    ref = _reference_impl_p(xv, w, None, None, None, None, "none", "none")
    got = _stem_impl_p(xv, w, None, None, None, None, "none", "none")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-6)


def test_grad_path_unchanged():
    """conv3x3x3_p's custom VJP is impl-independent: swapping the stem
    forward must leave gradients matching the twin's."""
    from gfe_mamba_tpu.ops.pallas import conv3d

    B, X, Y, Z, F = 1, 8, 8, 4, 8
    ks = jax.random.split(jax.random.PRNGKey(11), 2)
    xv = pack_z(_mk(ks[0], (B, X, Y, Z, 1)))
    w = _mk(ks[1], (3, 3, 3, 1, F)) * 0.3

    def loss(xv, w):
        return jnp.sum(conv3d.conv3x3x3_p(xv, w, None, None, None,
                                          None, "relu") ** 2)

    gx, gw = jax.grad(loss, (0, 1))(xv, w)
    assert np.isfinite(np.asarray(gx)).all()
    assert np.isfinite(np.asarray(gw)).all()
