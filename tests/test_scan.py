"""Equivalence tests across selective-scan execution paths (the
reference ships pscan vs sequential for exactly this check,
mamba.py:258-261) plus a golden comparison against a literal numpy
transcription of the recurrence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfe_mamba_tpu.ops.scan import (
    linear_recurrence, selective_scan, selective_scan_step,
)


def _numpy_selective_scan(x, delta, A, B, C, D, z=None, delta_bias=None,
                          delta_softplus=False):
    """Literal transcription of mamba.py:288-318 in numpy."""
    if delta_bias is not None:
        delta = delta + delta_bias
    if delta_softplus:
        delta = np.log1p(np.exp(delta))
    bsz, L, ED = x.shape
    N = A.shape[1]
    deltaA = np.exp(delta[..., None] * A)
    deltaBx = delta[..., None] * B[:, :, None, :] * x[..., None]
    h = np.zeros((bsz, ED, N))
    hs = []
    for t in range(L):
        h = deltaA[:, t] * h + deltaBx[:, t]
        hs.append(h.copy())
    hs = np.stack(hs, axis=1)
    y = np.einsum("blen,bln->ble", hs, C) + D * x
    if z is not None:
        y = y * (z / (1 + np.exp(-z)))
    return y


def _random_inputs(seed=0, bsz=2, L=9, ED=6, N=4):
    rng = np.random.RandomState(seed)
    x = rng.randn(bsz, L, ED).astype(np.float32)
    delta = rng.randn(bsz, L, ED).astype(np.float32) * 0.5
    A = -np.abs(rng.randn(ED, N)).astype(np.float32)
    B = rng.randn(bsz, L, N).astype(np.float32)
    C = rng.randn(bsz, L, N).astype(np.float32)
    D = rng.randn(ED).astype(np.float32)
    z = rng.randn(bsz, L, ED).astype(np.float32)
    bias = rng.randn(ED).astype(np.float32) * 0.1
    return x, delta, A, B, C, D, z, bias


def test_linear_recurrence_modes_agree():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.uniform(0.1, 0.99, (2, 17, 5, 3)), jnp.float32)
    b = jnp.asarray(rng.randn(2, 17, 5, 3), jnp.float32)
    h_assoc = linear_recurrence(a, b, mode="associative")
    h_seq = linear_recurrence(a, b, mode="sequential")
    np.testing.assert_allclose(np.asarray(h_assoc), np.asarray(h_seq),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["associative", "sequential"])
def test_selective_scan_matches_numpy_golden(mode):
    x, delta, A, B, C, D, z, bias = _random_inputs()
    expected = _numpy_selective_scan(x, delta, A, B, C, D, z=z,
                                     delta_bias=bias, delta_softplus=True)
    got = jax.jit(
        lambda *a: selective_scan(*a, delta_softplus=True, mode=mode)
    )(x, delta, A, B, C, D, z, bias)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-4, atol=2e-4)


def test_selective_scan_no_gate_no_softplus():
    x, delta, A, B, C, D, _, _ = _random_inputs(seed=3)
    delta = np.abs(delta)  # raw positive dt
    expected = _numpy_selective_scan(x, delta, A, B, C, D)
    got = selective_scan(jnp.asarray(x), jnp.asarray(delta), jnp.asarray(A),
                         jnp.asarray(B), jnp.asarray(C), jnp.asarray(D))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-4, atol=2e-4)


def test_step_matches_full_scan():
    """Recurrent stepping reproduces the parallel scan prefix-by-prefix."""
    x, delta, A, B, C, D, _, bias = _random_inputs(seed=4, L=7)
    delta_sp = np.log1p(np.exp(delta + bias))
    full = selective_scan(jnp.asarray(x), jnp.asarray(delta), jnp.asarray(A),
                          jnp.asarray(B), jnp.asarray(C), jnp.asarray(D),
                          delta_bias=jnp.asarray(bias), delta_softplus=True)
    h = jnp.zeros((x.shape[0], x.shape[2], A.shape[1]))
    for t in range(x.shape[1]):
        y_t, h = selective_scan_step(
            h, jnp.asarray(x[:, t]), jnp.asarray(delta_sp[:, t]),
            jnp.asarray(A), jnp.asarray(B[:, t]), jnp.asarray(C[:, t]),
            jnp.asarray(D),
        )
        np.testing.assert_allclose(np.asarray(y_t), np.asarray(full[:, t]),
                                   rtol=2e-4, atol=2e-4)


def test_selective_scan_gradients_flow():
    x, delta, A, B, C, D, z, bias = _random_inputs(seed=5, L=5)
    args = tuple(jnp.asarray(a) for a in (x, delta, A, B, C, D, z, bias))

    def loss(args):
        x, delta, A, B, C, D, z, bias = args
        y = selective_scan(x, delta, A, B, C, D, z=z, delta_bias=bias,
                           delta_softplus=True)
        return jnp.sum(y ** 2)

    grads = jax.grad(loss)(args)
    for g, name in zip(grads, "x delta A B C D z bias".split()):
        assert float(jnp.abs(g).sum()) > 0, f"zero grad for {name}"
        assert bool(jnp.isfinite(g).all()), f"non-finite grad for {name}"
