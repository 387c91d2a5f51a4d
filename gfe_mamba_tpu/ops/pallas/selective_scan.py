"""Fused Pallas TPU kernel for the Mamba selective scan.

The TPU-native equivalent of the mamba_ssm CUDA kernel the reference
optionally calls (mamba.py:180-186,243-252): one kernel fuses
softplus(delta + bias), the ZOH discretization, the time recurrence,
the output projection ``C . h + D*x`` and the ``y * silu(z)`` gate, so
the (B, L, ED, N)-sized intermediates (deltaA, deltaBx, hs) never
round-trip through HBM -- the XLA associative-scan path materializes
all three.

Layout: channels ED ride the 128-wide lane dimension (tiled ED_TILE at
a time); the N=16 state dimension rides sublanes; the L recurrence is a
``fori_loop`` carrying h in VMEM scratch (shape (N, ED_TILE)).  Grid =
(batch, ED tiles); every grid cell is independent, so the kernel scales
embarrassingly over batch x channels.

Backward: a custom_vjp re-derives gradients through the (numerically
identical) jnp associative-scan formulation; a fused backward kernel is
a planned optimization (forward is the serving-critical path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

DEFAULT_ED_TILE = 512


def _scan_kernel(x_ref, delta_ref, a_ref, b_ref, c_ref, d_ref, bias_ref,
                 z_ref, out_ref, h_scratch, *, seq_len: int, softplus: bool,
                 gate: bool):
    h_scratch[...] = jnp.zeros_like(h_scratch)

    def step(t, _):
        x_t = x_ref[0, pl.ds(t, 1), :]           # (1, ET)
        d_t = delta_ref[0, pl.ds(t, 1), :]       # (1, ET)
        if softplus:
            d_t = jax.nn.softplus(d_t + bias_ref[...])
        b_t = jnp.swapaxes(b_ref[0, pl.ds(t, 1), :], 0, 1)  # (N, 1)
        c_t = jnp.swapaxes(c_ref[0, pl.ds(t, 1), :], 0, 1)  # (N, 1)

        deltaA = jnp.exp(d_t * a_ref[...])        # (N, ET)
        deltaBx = (d_t * x_t) * b_t               # (N, ET)
        h = deltaA * h_scratch[...] + deltaBx
        h_scratch[...] = h

        y_t = jnp.sum(h * c_t, axis=0, keepdims=True) + d_ref[...] * x_t
        if gate:
            z_t = z_ref[0, pl.ds(t, 1), :]
            y_t = y_t * jax.nn.silu(z_t)
        out_ref[0, pl.ds(t, 1), :] = y_t
        return ()

    jax.lax.fori_loop(0, seq_len, step, ())


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _forward(x, delta, A, B, C, D, z, delta_bias, delta_softplus,
             ed_tile, interpret):
    bsz, seq_len, ed = x.shape
    n = A.shape[1]
    gate = z is not None

    tile = min(ed_tile, _round_up(ed, 128))
    ed_pad = _round_up(ed, tile)
    if ed_pad != ed:
        pad = [(0, 0), (0, 0), (0, ed_pad - ed)]
        x = jnp.pad(x, pad)
        delta = jnp.pad(delta, pad)
        A = jnp.pad(A, [(0, ed_pad - ed), (0, 0)])
        D = jnp.pad(D, [(0, ed_pad - ed)])
        if gate:
            z = jnp.pad(z, pad)
        if delta_bias is not None:
            delta_bias = jnp.pad(delta_bias, [(0, ed_pad - ed)])

    a_t = jnp.swapaxes(A, 0, 1)                   # (N, ED)
    d_row = D[None, :]                            # (1, ED)
    bias_row = (delta_bias if delta_bias is not None
                else jnp.zeros(ed_pad, x.dtype))[None, :]
    if not gate:
        z = jnp.zeros((bsz, 1, ed_pad), x.dtype)  # placeholder operand

    grid = (bsz, ed_pad // tile)
    kernel = functools.partial(
        _scan_kernel, seq_len=seq_len, softplus=delta_softplus, gate=gate)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, seq_len, tile), lambda b, e: (b, 0, e)),
            pl.BlockSpec((1, seq_len, tile), lambda b, e: (b, 0, e)),
            pl.BlockSpec((n, tile), lambda b, e: (0, e)),
            pl.BlockSpec((1, seq_len, n), lambda b, e: (b, 0, 0)),
            pl.BlockSpec((1, seq_len, n), lambda b, e: (b, 0, 0)),
            pl.BlockSpec((1, tile), lambda b, e: (0, e)),
            pl.BlockSpec((1, tile), lambda b, e: (0, e)),
            pl.BlockSpec((1, z.shape[1], tile), lambda b, e: (b, 0, e)),
        ],
        out_specs=pl.BlockSpec((1, seq_len, tile), lambda b, e: (b, 0, e)),
        out_shape=jax.ShapeDtypeStruct((bsz, seq_len, ed_pad), x.dtype),
        scratch_shapes=[pltpu.VMEM((n, tile), jnp.float32)],
        interpret=interpret,
    )(x, delta, a_t, B, C, d_row, bias_row, z)

    return out[:, :, :ed]


def _reference(x, delta, A, B, C, D, z, delta_bias, delta_softplus):
    from gfe_mamba_tpu.ops.scan import selective_scan
    return selective_scan(x, delta, A, B, C, D, z=z, delta_bias=delta_bias,
                          delta_softplus=delta_softplus, mode="associative")


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _selective_scan_pallas(x, delta, A, B, C, D, z, delta_bias,
                           delta_softplus, ed_tile, interpret):
    return _forward(x, delta, A, B, C, D, z, delta_bias, delta_softplus,
                    ed_tile, interpret)


def _vjp_fwd(x, delta, A, B, C, D, z, delta_bias, delta_softplus, ed_tile,
             interpret):
    y = _forward(x, delta, A, B, C, D, z, delta_bias, delta_softplus,
                 ed_tile, interpret)
    return y, (x, delta, A, B, C, D, z, delta_bias)


def _vjp_bwd(delta_softplus, ed_tile, interpret, residuals, g):
    x, delta, A, B, C, D, z, delta_bias = residuals

    def ref(x, delta, A, B, C, D, z, delta_bias):
        return _reference(x, delta, A, B, C, D, z, delta_bias,
                          delta_softplus)

    _, vjp = jax.vjp(ref, x, delta, A, B, C, D, z, delta_bias)
    grads = vjp(g)
    if z is None:
        grads = grads[:6] + (None, grads[7])
    if delta_bias is None:
        grads = grads[:7] + (None,)
    return grads


_selective_scan_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def selective_scan_pallas(x: Array, delta: Array, A: Array, B: Array,
                          C: Array, D: Array, z: Array | None = None,
                          delta_bias: Array | None = None,
                          delta_softplus: bool = False,
                          ed_tile: int = DEFAULT_ED_TILE,
                          interpret: bool | None = None) -> Array:
    """Fused selective scan (mamba_ssm contract).  ``interpret=None``
    auto-selects interpreter mode off-TPU so tests run on CPU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _selective_scan_pallas(x, delta, A, B, C, D, z, delta_bias,
                                  delta_softplus, ed_tile, interpret)
