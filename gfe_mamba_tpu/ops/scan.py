"""Selective-scan primitives for SSM (Mamba) layers.

TPU-native replacement for the reference's three scan paths
(cross_atten/mamba.py:243-318 + cross_atten/pscan.py):

* ``mode='sequential'``  -- ``lax.scan`` over time, O(L) depth
  (mirrors mamba.py:288-318 ``selective_scan_seq``)
* ``mode='associative'`` -- ``lax.associative_scan`` with the first-order
  linear-recurrence combinator, O(log L) depth (the XLA-native
  equivalent of the Blelloch pscan, pscan.py:35-93)
* ``mode='pallas'``      -- fused Pallas TPU kernel
  (gfe_mamba_tpu.ops.pallas.selective_scan)

``selective_scan`` fuses softplus(delta + bias), the recurrence,
the output projection ``C . h + D*x`` and the ``y * silu(z)`` gate in one
jitted function -- the same fusion boundary as the mamba_ssm CUDA kernel
invoked at mamba.py:251.

Recurrence (mamba.py:275-286):
    h[t] = exp(delta[t] * A) * h[t-1] + (delta[t] * B[t]) * x[t]
    y[t] = C[t] . h[t] + D * x[t]
with shapes x, delta: (B, L, ED); A: (ED, N); B, C: (B, L, N); D: (ED).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def _first_order_combine(left, right):
    """Combinator for h[t] = a[t] * h[t-1] + b[t] under associative_scan."""
    a_l, b_l = left
    a_r, b_r = right
    return a_l * a_r, a_r * b_l + b_r


def linear_recurrence(coeffs: Array, values: Array, *, axis: int = 1,
                      mode: str = "associative") -> Array:
    """All-prefix solutions of ``h[t] = coeffs[t] * h[t-1] + values[t]``
    with ``h[-1] = 0``, along ``axis``."""
    if mode == "associative":
        _, hs = lax.associative_scan(
            _first_order_combine, (coeffs, values), axis=axis
        )
        return hs
    if mode == "sequential":
        coeffs_t = jnp.moveaxis(coeffs, axis, 0)
        values_t = jnp.moveaxis(values, axis, 0)

        def step(h, ab):
            a, b = ab
            h = a * h + b
            return h, h

        h0 = jnp.zeros_like(values_t[0])
        _, hs = lax.scan(step, h0, (coeffs_t, values_t))
        return jnp.moveaxis(hs, 0, axis)
    raise ValueError(f"unknown scan mode {mode!r}")


def selective_scan(x: Array, delta: Array, A: Array, B: Array, C: Array,
                   D: Array, z: Array | None = None,
                   delta_bias: Array | None = None,
                   delta_softplus: bool = False,
                   mode: str = "associative") -> Array:
    """Fused selective scan (the mamba_ssm ``selective_scan_fn`` contract,
    mamba.py:243-252).

    Args:
      x:     (B, L, ED) post-conv post-silu activations
      delta: (B, L, ED) raw dt (pre-softplus if ``delta_softplus``)
      A:     (ED, N) state matrix (negative real)
      B, C:  (B, L, N) input/output projections
      D:     (ED,) skip term
      z:     optional (B, L, ED) gate; output is multiplied by silu(z)
      delta_bias: optional (ED,) added to delta before softplus
      mode:  'associative' | 'sequential' | 'pallas'
    Returns: y (B, L, ED)
    """
    # the recurrence runs in f32 regardless of the surrounding compute
    # dtype -- same policy as the CUDA selective scan, which rejects
    # (b)float16 states (reference jamba.py:31-33); the big projections
    # around the scan stay in bf16
    out_dtype = x.dtype
    x = x.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    A = A.astype(jnp.float32)
    B = B.astype(jnp.float32)
    C = C.astype(jnp.float32)
    D = D.astype(jnp.float32)
    if z is not None:
        z = z.astype(jnp.float32)
    if delta_bias is not None:
        delta_bias = delta_bias.astype(jnp.float32)

    if mode == "pallas":
        # the whole epilogue (bias + softplus + gate) fuses in-kernel
        from gfe_mamba_tpu.ops.pallas.selective_scan import selective_scan_pallas
        return selective_scan_pallas(x, delta, A, B, C, D, z=z,
                                     delta_bias=delta_bias,
                                     delta_softplus=delta_softplus
                                     ).astype(out_dtype)

    if delta_bias is not None:
        delta = delta + delta_bias
    if delta_softplus:
        delta = jax.nn.softplus(delta)

    # discretize: ZOH for A, Euler for B (mamba.py:275-278)
    deltaA = jnp.exp(delta[..., None] * A)               # (B, L, ED, N)
    deltaBx = (delta * x)[..., None] * B[:, :, None, :]  # (B, L, ED, N)
    hs = linear_recurrence(deltaA, deltaBx, axis=1, mode=mode)
    y = jnp.einsum("blen,bln->ble", hs, C) + D * x

    if z is not None:
        y = y * jax.nn.silu(z)
    return y.astype(out_dtype)


def selective_scan_step(h: Array, x: Array, delta: Array, A: Array, B: Array,
                        C: Array, D: Array) -> tuple[Array, Array]:
    """One recurrent step (O(1) state inference, mamba.py:375-405).

    Args:
      h:     (B, ED, N) carried state
      x:     (B, ED) current input
      delta: (B, ED) post-softplus dt
      A: (ED, N); B, C: (B, N); D: (ED,)
    Returns: (y (B, ED), new h (B, ED, N))
    """
    deltaA = jnp.exp(delta[..., None] * A)              # (B, ED, N)
    deltaBx = (delta * x)[..., None] * B[:, None, :]    # (B, ED, N)
    h = deltaA * h + deltaBx
    y = jnp.einsum("ben,bn->be", h, C) + D * x
    return y, h
