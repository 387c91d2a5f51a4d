"""Pallas selective-scan kernel vs the XLA associative-scan path
(interpreter mode on CPU; the same kernel compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfe_mamba_tpu.ops.scan import selective_scan


def _inputs(seed=0, bsz=2, L=7, ED=6, N=4, gate=True, bias=True):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(bsz, L, ED), jnp.float32)
    delta = jnp.asarray(rng.randn(bsz, L, ED) * 0.5, jnp.float32)
    A = jnp.asarray(-np.abs(rng.randn(ED, N)), jnp.float32)
    B = jnp.asarray(rng.randn(bsz, L, N), jnp.float32)
    C = jnp.asarray(rng.randn(bsz, L, N), jnp.float32)
    D = jnp.asarray(rng.randn(ED), jnp.float32)
    z = jnp.asarray(rng.randn(bsz, L, ED), jnp.float32) if gate else None
    b = jnp.asarray(rng.randn(ED) * 0.1, jnp.float32) if bias else None
    return x, delta, A, B, C, D, z, b


@pytest.mark.parametrize("gate,bias", [(True, True), (False, False)])
def test_pallas_matches_associative(gate, bias):
    x, delta, A, B, C, D, z, b = _inputs(gate=gate, bias=bias)
    ref = selective_scan(x, delta, A, B, C, D, z=z, delta_bias=b,
                         delta_softplus=True, mode="associative")
    got = selective_scan(x, delta, A, B, C, D, z=z, delta_bias=b,
                         delta_softplus=True, mode="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pallas_ed_not_multiple_of_tile():
    # ED=6 exercises lane padding; also try ED > one tile boundary
    x, delta, A, B, C, D, z, b = _inputs(seed=1, ED=10)
    ref = selective_scan(x, delta, A, B, C, D, z=z, delta_bias=b,
                         delta_softplus=True, mode="associative")
    got = selective_scan(x, delta, A, B, C, D, z=z, delta_bias=b,
                         delta_softplus=True, mode="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pallas_gradients_match_associative():
    x, delta, A, B, C, D, z, b = _inputs(seed=2, L=5)

    def loss(mode):
        def fn(args):
            x, delta, A, B, C, D, z, b = args
            y = selective_scan(x, delta, A, B, C, D, z=z, delta_bias=b,
                               delta_softplus=True, mode=mode)
            return jnp.sum(y ** 2)
        return fn

    args = (x, delta, A, B, C, D, z, b)
    g_ref = jax.grad(loss("associative"))(args)
    g_pal = jax.grad(loss("pallas"))(args)
    for a, b_, name in zip(g_ref, g_pal, "x delta A B C D z bias".split()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=5e-4,
                                   err_msg=f"grad mismatch for {name}")


@pytest.mark.parametrize("gate,bias,softplus", [
    (True, False, True), (False, True, True), (True, True, False),
])
def test_pallas_fused_backward_variants(gate, bias, softplus):
    """Fused Pallas backward vs associative VJP for every epilogue
    combination (mamba_ssm training semantics, mamba.py:243-252)."""
    x, delta, A, B, C, D, z, b = _inputs(seed=3, L=9, ED=5, gate=gate,
                                         bias=bias)

    def loss(mode):
        def fn(args):
            x, delta, A, B, C, D, z, b = args
            y = selective_scan(x, delta, A, B, C, D, z=z, delta_bias=b,
                               delta_softplus=softplus, mode=mode)
            return jnp.sum(jnp.sin(y))
        return fn

    args = (x, delta, A, B, C, D, z, b)
    g_ref = jax.grad(loss("associative"))(args)
    g_pal = jax.grad(loss("pallas"))(args)
    for ref, got in zip(jax.tree_util.tree_leaves(g_ref),
                        jax.tree_util.tree_leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=5e-4, atol=5e-4)


def test_pallas_backward_long_L_falls_back():
    """Past the VMEM recompute budget the VJP uses the associative
    fallback; under it the fused kernel is selected."""
    from gfe_mamba_tpu.ops.pallas.selective_scan import _vmem_bwd_tile
    assert _vmem_bwd_tile(64, 16) == 512
    assert _vmem_bwd_tile(512, 16) in (256, 128)
    assert _vmem_bwd_tile(1 << 14, 16) is None
