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

Backward: a fused Pallas kernel (the TPU twin of mamba_ssm's fused
selective_scan backward, reference mamba.py:243-252 training path).
It recomputes the forward states h_t into a VMEM scratch buffer (no
(B, L, ED, N) HBM residuals), then runs the reverse-time recurrence
    dh[t-1] = exp(delta[t] A) * dh[t] + C[t-1] * ds[t-1]
producing dx/ddelta/dz in-place and per-(batch, tile) partials for
dA/dD/dbias/dB/dC that XLA reduces outside.  When L is too long for
the VMEM recompute buffer the custom_vjp falls back to the XLA
associative formulation.
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
        d_t = delta_ref[0, pl.ds(t, 1), :] + bias_ref[...]  # (1, ET)
        if softplus:
            d_t = jax.nn.softplus(d_t)
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


def _bwd_kernel(x_ref, delta_ref, a_ref, b_ref, c_ref, d_ref, bias_ref,
                z_ref, g_ref,
                dx_ref, ddelta_ref, dz_ref, da_ref, daux_ref, db_ref, dc_ref,
                h_buf, *, seq_len: int, softplus: bool, gate: bool):
    """Fused selective-scan backward for one (batch, ED-tile) cell.

    Pass 1 recomputes h_t (forward) into ``h_buf`` (L, N, ET) VMEM.
    Pass 2 runs reverse-time carrying dh (N, ET), emitting dx, ddelta,
    dz and accumulating dA (N, ET), dD/dbias (rows of daux) and the
    lane-reduced dB/dC (L, N) partials for this tile.
    """
    n = a_ref.shape[0]
    et = a_ref.shape[1]

    def delta_at(t):
        d_t = delta_ref[0, pl.ds(t, 1), :] + bias_ref[...]   # (1, ET)
        if softplus:
            return jax.nn.softplus(d_t)
        return d_t

    # ---- pass 1: forward recompute of the states ----------------------
    def fwd_step(t, h):
        d_t = delta_at(t)
        x_t = x_ref[0, pl.ds(t, 1), :]
        b_t = jnp.swapaxes(b_ref[0, pl.ds(t, 1), :], 0, 1)   # (N, 1)
        h = jnp.exp(d_t * a_ref[...]) * h + (d_t * x_t) * b_t
        h_buf[pl.ds(t, 1), :, :] = h[None]
        return h

    jax.lax.fori_loop(0, seq_len, fwd_step,
                      jnp.zeros((n, et), jnp.float32))

    # ---- pass 2: reverse-time gradient recurrence ----------------------
    da_acc0 = jnp.zeros((n, et), jnp.float32)
    dd_acc0 = jnp.zeros((1, et), jnp.float32)
    dbias_acc0 = jnp.zeros((1, et), jnp.float32)

    def bwd_step(i, carry):
        # h_t is carried from the previous (later-t) iteration, so only
        # h_{t-1} is read from the buffer: one buffer read per step
        dh, h_t, da_acc, dd_acc, dbias_acc = carry
        t = seq_len - 1 - i
        x_t = x_ref[0, pl.ds(t, 1), :]                       # (1, ET)
        g_t = g_ref[0, pl.ds(t, 1), :]
        b_t = jnp.swapaxes(b_ref[0, pl.ds(t, 1), :], 0, 1)   # (N, 1)
        c_t = jnp.swapaxes(c_ref[0, pl.ds(t, 1), :], 0, 1)   # (N, 1)
        d_t = delta_at(t)
        h_prev = jnp.where(
            t > 0, h_buf[pl.ds(jnp.maximum(t - 1, 0), 1), :, :][0], 0.0)
        deltaA = jnp.exp(d_t * a_ref[...])                   # (N, ET)

        if gate:
            # y = s * silu(z): recompute s for dz
            s_t = (jnp.sum(h_t * c_t, axis=0, keepdims=True)
                   + d_ref[...] * x_t)
            z_t = z_ref[0, pl.ds(t, 1), :]
            sig = jax.nn.sigmoid(z_t)
            silu = z_t * sig
            ds = g_t * silu
            dz_ref[0, pl.ds(t, 1), :] = g_t * s_t * (
                sig * (1.0 + z_t * (1.0 - sig)))
        else:
            ds = g_t

        # dh_t = C_t * ds_t + deltaA_{t+1} * dh_{t+1} (carry pre-scaled)
        dh = dh + c_t * ds

        # splits of dh: through deltaBx (delta*x*B) and through deltaA:
        # d(delta) = sum_n dh*(B x) + sum_n dh*h_prev*A*exp(delta A)
        ddelta_t = (jnp.sum(dh * b_t, axis=0, keepdims=True) * x_t
                    + jnp.sum(dh * h_prev * a_ref[...] * deltaA, axis=0,
                              keepdims=True))
        dx_t = (jnp.sum(dh * b_t, axis=0, keepdims=True) * d_t
                + d_ref[...] * ds)
        if softplus:
            raw = delta_ref[0, pl.ds(t, 1), :] + bias_ref[...]
            ddelta_t = ddelta_t * jax.nn.sigmoid(raw)
        # d(bias) = sum_t d(delta_raw), with or without softplus
        dbias_acc = dbias_acc + ddelta_t
        dx_ref[0, pl.ds(t, 1), :] = dx_t
        ddelta_ref[0, pl.ds(t, 1), :] = ddelta_t

        # lane-reduced partials for this tile
        db_ref[0, 0, pl.ds(t, 1), :] = jnp.swapaxes(
            jnp.sum(dh * (d_t * x_t), axis=1, keepdims=True), 0, 1)
        dc_ref[0, 0, pl.ds(t, 1), :] = jnp.swapaxes(
            jnp.sum(h_t * ds, axis=1, keepdims=True), 0, 1)

        da_acc = da_acc + dh * h_prev * d_t * deltaA
        dd_acc = dd_acc + ds * x_t

        # propagate: dh_{t-1} receives deltaA_t * dh_t
        dh = dh * deltaA
        return dh, h_prev, da_acc, dd_acc, dbias_acc

    h_last = h_buf[pl.ds(seq_len - 1, 1), :, :][0]
    _, _, da_acc, dd_acc, dbias_acc = jax.lax.fori_loop(
        0, seq_len, bwd_step,
        (jnp.zeros((n, et), jnp.float32), h_last,
         da_acc0, dd_acc0, dbias_acc0))
    da_ref[0] = da_acc
    daux_ref[0] = jnp.concatenate(
        [dd_acc, dbias_acc,
         jnp.zeros((daux_ref.shape[1] - 2, et), jnp.float32)], axis=0)


def _vmem_bwd_tile(seq_len: int, n: int, budget_bytes: int = 8 << 20
                   ) -> int | None:
    """Largest ED tile whose backward VMEM footprint fits, or None."""
    for tile in (512, 256, 128):
        # h_buf (L,N,ET) + ~8 (L,ET) streams, all f32
        if seq_len * tile * (n + 8) * 4 <= budget_bytes:
            return tile
    return None


def _backward(x, delta, A, B, C, D, z, delta_bias, delta_softplus, g,
              ed_tile, interpret):
    bsz, seq_len, ed = x.shape
    n = A.shape[1]
    gate = z is not None
    has_bias = delta_bias is not None

    tile = min(ed_tile, _vmem_bwd_tile(seq_len, n) or 0,
               _round_up(ed, 128))
    ed_pad = _round_up(ed, tile)
    if ed_pad != ed:
        pad = [(0, 0), (0, 0), (0, ed_pad - ed)]
        x = jnp.pad(x, pad)
        delta = jnp.pad(delta, pad)
        g = jnp.pad(g, pad)
        A = jnp.pad(A, [(0, ed_pad - ed), (0, 0)])
        D = jnp.pad(D, [(0, ed_pad - ed)])
        if gate:
            z = jnp.pad(z, pad)
        if has_bias:
            delta_bias = jnp.pad(delta_bias, [(0, ed_pad - ed)])

    a_t = jnp.swapaxes(A, 0, 1)
    d_row = D[None, :]
    bias_row = (delta_bias if has_bias
                else jnp.zeros(ed_pad, x.dtype))[None, :]
    if not gate:
        z = jnp.zeros((bsz, 1, ed_pad), x.dtype)

    n_tiles = ed_pad // tile
    grid = (bsz, n_tiles)
    kernel = functools.partial(
        _bwd_kernel, seq_len=seq_len, softplus=delta_softplus, gate=gate)

    out_shapes = (
        jax.ShapeDtypeStruct((bsz, seq_len, ed_pad), jnp.float32),  # dx
        jax.ShapeDtypeStruct((bsz, seq_len, ed_pad), jnp.float32),  # ddelta
        jax.ShapeDtypeStruct((bsz, z.shape[1], ed_pad), jnp.float32),  # dz
        jax.ShapeDtypeStruct((bsz, n, ed_pad), jnp.float32),        # dA part
        jax.ShapeDtypeStruct((bsz, 8, ed_pad), jnp.float32),        # dD/dbias
        jax.ShapeDtypeStruct((bsz, n_tiles, seq_len, n), jnp.float32),
        jax.ShapeDtypeStruct((bsz, n_tiles, seq_len, n), jnp.float32),
    )
    seq_spec = pl.BlockSpec((1, seq_len, tile), lambda b, e: (b, 0, e))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            seq_spec,                                               # x
            seq_spec,                                               # delta
            pl.BlockSpec((n, tile), lambda b, e: (0, e)),           # A^T
            pl.BlockSpec((1, seq_len, n), lambda b, e: (b, 0, 0)),  # B
            pl.BlockSpec((1, seq_len, n), lambda b, e: (b, 0, 0)),  # C
            pl.BlockSpec((1, tile), lambda b, e: (0, e)),           # D
            pl.BlockSpec((1, tile), lambda b, e: (0, e)),           # bias
            pl.BlockSpec((1, z.shape[1], tile), lambda b, e: (b, 0, e)),
            seq_spec,                                               # g
        ],
        out_specs=(
            seq_spec,
            seq_spec,
            pl.BlockSpec((1, z.shape[1], tile), lambda b, e: (b, 0, e)),
            pl.BlockSpec((1, n, tile), lambda b, e: (b, 0, e)),
            pl.BlockSpec((1, 8, tile), lambda b, e: (b, 0, e)),
            pl.BlockSpec((1, 1, seq_len, n), lambda b, e: (b, e, 0, 0)),
            pl.BlockSpec((1, 1, seq_len, n), lambda b, e: (b, e, 0, 0)),
        ),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((seq_len, n, tile), jnp.float32)],
        interpret=interpret,
    )(x, delta, a_t, B, C, d_row, bias_row, z, g)

    dx, ddelta, dz, da_part, daux, db_part, dc_part = outs
    dx = dx[:, :, :ed]
    ddelta = ddelta[:, :, :ed]
    dA = jnp.swapaxes(jnp.sum(da_part, axis=0), 0, 1)[:ed]   # (ED, N)
    dD = jnp.sum(daux[:, 0, :ed], axis=0)                    # (ED,)
    dbias = jnp.sum(daux[:, 1, :ed], axis=0) if has_bias else None
    dB = jnp.sum(db_part, axis=1)                             # (B, L, N)
    dC = jnp.sum(dc_part, axis=1)                             # (B, L, N)
    dz = dz[:, :, :ed] if gate else None
    return dx, ddelta, dA, dB, dC, dD, dz, dbias


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

    if _vmem_bwd_tile(x.shape[1], A.shape[1]) is not None:
        dx, ddelta, dA, dB, dC, dD, dz, dbias = _backward(
            x, delta, A, B, C, D, z, delta_bias, delta_softplus, g,
            ed_tile, interpret)
        return (dx, ddelta, dA, dB, dC, dD, dz, dbias)

    # L too long for the VMEM recompute buffer: fall back to the XLA
    # associative formulation (numerically identical forward)
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
