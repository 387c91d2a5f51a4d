"""Fused Pallas GroupNorm+activation kernel vs the jnp reference
(interpreter mode on CPU; compiles + matches on real TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfe_mamba_tpu.ops.pallas.group_norm import group_norm_act, _reference


@pytest.mark.parametrize("act", ["none", "elu", "relu"])
def test_matches_reference(act):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 11, 7, 3, 16), jnp.float32)
    scale = jnp.asarray(rng.randn(16), jnp.float32)
    bias = jnp.asarray(rng.randn(16), jnp.float32)
    got = group_norm_act(x, scale, bias, num_groups=4, act=act, chunk=64)
    ref = _reference(x, scale, bias, 4, 1e-5, act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_gradients_match_reference():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 4, 2, 8), jnp.float32)
    scale = jnp.asarray(rng.randn(8), jnp.float32)
    bias = jnp.asarray(rng.randn(8), jnp.float32)

    g = jax.grad(lambda *a: jnp.sum(
        group_norm_act(*a, num_groups=2, act="elu", chunk=32) ** 2),
        argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(lambda *a: jnp.sum(
        _reference(*a, 2, 1e-5, "elu") ** 2), argnums=(0, 1, 2))(
        x, scale, bias)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)
