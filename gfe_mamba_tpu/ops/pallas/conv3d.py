"""Fused (GroupNorm-apply +) 3x3x3 conv (+ bias + activation) TPU kernel.

Why this exists: on the v5e, a bare channels-last 3^3 conv at the
flagship's full-resolution shapes runs at ~39% of bf16 peak (14 ms at
(2,160,160,96,64)->64), but the moment a GroupNorm sits between two
convs XLA's fusion entangles the normalization reductions with the
conv and the SAME conv runs at 8-16% (69-80 ms measured; an
optimization_barrier only gets it back to 41 ms because a conv reading
a materialized buffer pays a ~21 ms relayout).  The reference trains
exactly that pattern everywhere: SingleConv order 'gcr'/'cge'
(pytorch3dunet/unet3d/buildingblocks.py:50-115).

This kernel breaks the pathology by doing the whole unit as one Pallas
custom call: the GN *apply* is folded into the producer pad as a
per-(batch, channel) affine, and the conv + bias + activation run
tile-resident in VMEM as 9 accumulated (M, 3C) @ (3C, F) MXU GEMMs
(the three z-taps of each (dx, dy) are concatenated along the lane dim
so the contraction is 3C wide instead of C).

Layout: channels-last (B, X, Y, Z, C), SAME padding, stride 1 -- the
only 3D conv shape the GFE-Mamba generator uses.  Weights are flax
HWDIO (3, 3, 3, C, F).

Gradients: ``conv3x3x3`` carries a custom_vjp with a fast backward
(``_bwd``): dz reuses this SAME fused kernel with flipped/transposed
weights (the transpose of a SAME stride-1 odd conv is itself a SAME
conv of the cotangent), dw is computed as 27 huge-K dot_generals
contracting over batch x space, and act' is recovered from the saved
OUTPUT (no pre-activation residual).  It matches jax.vjp of the XLA
reference (gradient-parity tested on-chip, rel err ~6e-3 bf16) and
cut the canonical b1 generator train step 548 -> 389 ms (PERF_NOTES
"Training step").
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_ACTS = ("none", "relu", "elu", "leaky01", "leaky001")


def _apply_act(y: Array, act: str) -> Array:
    if act == "none":
        return y
    if act == "relu":
        return jnp.maximum(y, 0.0)
    if act == "elu":
        # no expm1 lowering in Mosaic: write via exp (CLAUDE.md gotcha)
        return jnp.where(y > 0, y, jnp.exp(jnp.minimum(y, 0.0)) - 1.0)
    if act == "leaky01":
        return jnp.where(y > 0, y, 0.1 * y)
    if act == "leaky001":
        return jnp.where(y > 0, y, 0.01 * y)
    raise ValueError(f"unknown activation {act!r}")


# Split staging (round 3): dot the dense center 2C block of the K
# layout straight from the input slab (z offset 1) and stage only the
# two C-wide edge slices -- halves the per-tile staging-store traffic
# vs building the full 4C operand.  Round-4 on-chip A/B
# (tools/ab_split_staging.py, b4 full-res): split 23.34 ms/unit
# (47.3% dense peak) vs full-4C 25.78 ms (42.8%) -- Mosaic accepts the
# sublane-offset center operand and the split layout wins by 10.5%;
# numeric parity with the XLA reference verified on-chip for
# elu / residual+leaky / ragged-tile shapes.  The round-5 "aligned"
# edge-staging variant (lane-offset-preserving edge stores, swapped
# weight rows) measured WORSE on-chip (25.68 ms/unit vs 23.93): the
# edge lane-rotate is not the cost, so split=True stays the default.
_SPLIT_STAGING = True


def _kernel(w_ref, b_ref, x_ref, *rest, XT, YT,
            ZH, C, F, act, out_dtype, with_res=False, post_act="none",
            split=_SPLIT_STAGING):
    """One (b, i, j) output tile.

    z-pairs are packed into the lane dim outside the kernel (fine z =
    2*zh + h, lane index h*C + c), so lanes are 2C >= 128 -- this both
    satisfies the DMA lane-alignment rule and fills the MXU's 128
    output lanes (2F wide) that a bare C=64 conv would leave half
    empty.  Cost: the 4-slot K layout carries 25% structural zeros
    (4/3 FLOP inflation) -- a bargain against the 5x GN->conv XLA
    fusion pathology this kernel replaces.
    """
    if with_res:
        res_ref, out_ref, in_buf, a4_buf, sem = rest
    else:
        out_ref, in_buf, a4_buf, sem = rest
        res_ref = None
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    nx, ny, nb = pl.num_programs(1), pl.num_programs(2), pl.num_programs(0)
    step = (b * nx + i) * ny + j
    slot = jax.lax.rem(step, 2)

    def start_dma(s, bb, ii, jj):
        pltpu.make_async_copy(
            x_ref.at[bb, pl.ds(ii * XT, XT + 2), pl.ds(jj * YT, YT + 2)],
            in_buf.at[s], sem.at[s]).start()

    # double-buffered input pipeline: this tile's DMA was started by the
    # previous step (except step 0); kick off the next tile's before
    # computing
    @pl.when(step == 0)
    def _():
        start_dma(0, b, i, j)

    nj = jax.lax.rem(j + 1, ny)
    carry_i = (j + 1) // ny
    ni_ = jax.lax.rem(i + carry_i, nx)
    nb_ = b + (i + carry_i) // nx

    pltpu.make_async_copy(
        x_ref.at[b, pl.ds(i * XT, XT + 2), pl.ds(j * YT, YT + 2)],
        in_buf.at[slot], sem.at[slot]).wait()

    @pl.when(nb_ < nb)
    def _():
        start_dma(1 - slot, nb_, ni_, nj)

    # z-expand ONCE per tile over the full halo'd extent: K slots for
    # output row zh are [zh(h1) | zh+1(h0) | zh+1(h1) | zh+2(h0)]
    # (staged via stores -- Mosaic cannot combine vectors with
    # mismatched sublane offsets directly)
    slab = in_buf[slot]
    acc = jnp.zeros((XT, YT, ZH, 2 * F), jnp.float32)
    if split:
        # center 2C rows (K slots 1-2, dense) read straight from the
        # slab; only the two C-wide edge slices (slots 0 and 3) are
        # staged.  w_ref rows: [0:2C) center, [2C:4C) edges.
        if split == "aligned":
            # lane-ALIGNED staging: each edge store keeps its source
            # lane offset (slot 3 lives in lanes [0,C) both in the slab
            # and in a4_buf; slot 0 in [C,2C)) so Mosaic emits plain
            # sublane-shifted copies with no cross-lane rotate.  The
            # matching weight rows are swapped in _pack_weights.
            a4_buf[:, :, :, 0:C] = slab[:, :, 2:ZH + 2, 0:C]
            a4_buf[:, :, :, C:2 * C] = slab[:, :, 0:ZH, C:2 * C]
        else:
            a4_buf[:, :, :, 0:C] = slab[:, :, 0:ZH, C:2 * C]
            a4_buf[:, :, :, C:2 * C] = slab[:, :, 2:ZH + 2, 0:C]
        for dx in range(3):
            for dy in range(3):
                w9 = w_ref[dx * 3 + dy]
                acc += jax.lax.dot_general(
                    slab[dx:dx + XT, dy:dy + YT, 1:ZH + 1, :],
                    w9[0:2 * C], (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc += jax.lax.dot_general(
                    a4_buf[dx:dx + XT, dy:dy + YT], w9[2 * C:4 * C],
                    (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
    else:
        a4_buf[:, :, :, 0 * C:1 * C] = slab[:, :, 0:ZH, C:2 * C]
        a4_buf[:, :, :, 1 * C:3 * C] = slab[:, :, 1:ZH + 1, :]
        a4_buf[:, :, :, 3 * C:4 * C] = slab[:, :, 2:ZH + 2, 0:C]
        for dx in range(3):
            for dy in range(3):
                acc += jax.lax.dot_general(
                    a4_buf[dx:dx + XT, dy:dy + YT], w_ref[dx * 3 + dy],
                    (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

    acc += b_ref[0].astype(jnp.float32)
    acc = _apply_act(acc, act)
    if res_ref is not None:
        # fused ResNetBlock tail: (conv + residual) -> non-linearity
        # (buildingblocks.py:216-228) without materializing the sum
        acc = acc + res_ref[0].astype(jnp.float32)
    acc = _apply_act(acc, post_act)
    out_ref[0] = acc.astype(out_dtype)


def _pack_weights(w, dtype, split=_SPLIT_STAGING):
    """(3,3,3,C,F) -> (9, 4C, 2F) for the z-pair-packed GEMM.

    Output lane h*F+f with tap displacement da = dz-1 reads K slot
    s = h + dz - 1 + 1 = h + dz (s in 0..3).  With ``split`` the slot
    rows are reordered [1, 2, 0, 3] so the dense center block (slots
    1-2) occupies K rows [0, 2C) and the two half-zero edge slots the
    rows [2C, 4C) -- matching the kernel's slab-direct center dot.
    With ``split == "aligned"`` the edge slots swap to [1, 2, 3, 0],
    matching the kernel's lane-offset-preserving edge stores."""
    C, F = w.shape[-2:]
    w4 = jnp.zeros((3, 3, 4, C, 2, F), dtype)
    wt = w.astype(dtype)
    for dz in range(3):
        for h in range(2):
            w4 = w4.at[:, :, h + dz, :, h, :].set(wt[:, :, dz])
    if split == "aligned":
        w4 = w4[:, :, jnp.array([1, 2, 3, 0])]
    elif split:
        w4 = w4[:, :, jnp.array([1, 2, 0, 3])]
    return w4.reshape(3, 3, 4 * C, 2 * F).reshape(9, 4 * C, 2 * F)


def pack_z(x: Array) -> Array:
    """(B, X, Y, Z, C) -> (B, X, Y, Z//2, 2C): z-pair lane packing.

    A free bitcast for dense layouts; materializing the PACKED form is
    the whole point -- a (..., Z, 64) buffer tile-pads lanes 64->128
    (2x HBM) while (..., Z//2, 128) is lane-full (PERF_NOTES r3)."""
    B, X, Y, Z, C = x.shape
    return x.reshape(B, X, Y, Z // 2, 2 * C)


def unpack_z(xp: Array) -> Array:
    """Inverse of :func:`pack_z`."""
    B, X, Y, ZH, C2 = xp.shape
    return xp.reshape(B, X, Y, ZH * 2, C2 // 2)


@functools.partial(
    jax.jit,
    static_argnames=("act", "post_act", "out_dtype", "xt", "yt", "interpret",
                     "split"))
def _conv3x3x3_fused_p(xv, w, bias, pre_scale, pre_shift, residual=None, *,
                       act="none", post_act="none", out_dtype=None, xt=8,
                       yt=8, interpret=False, split=_SPLIT_STAGING):
    """Packed-domain fused unit: all tensor IO is z-pair packed.

    Computes ``post_act(act(conv3d(x*scale+shift, w) + bias)
    + residual)`` where x is the unpacked view of ``xv``
    (B, X, Y, ZH, 2C) and the output / ``residual`` are packed
    (B, X, Y, ZH, 2F).  pre_scale/pre_shift: (B, C) or None.
    """
    B, X, Y, ZH, C2 = xv.shape
    C = C2 // 2
    F = w.shape[-1]
    out_dtype = out_dtype or xv.dtype
    XT, YT = xt, yt
    nx, ny = pl.cdiv(X, XT), pl.cdiv(Y, YT)
    ZP = -(-(ZH + 2) // 8) * 8   # packed z rows incl. halo, 8-aligned

    # fold the GN apply + halo pad into one producer pass over the
    # (already packed, lane-full) input
    if pre_scale is not None:
        a2 = jnp.tile(pre_scale, (1, 2)).astype(xv.dtype)
        xv = xv * a2[:, None, None, None, :]
    if pre_shift is not None:
        b2 = jnp.tile(pre_shift, (1, 2)).astype(xv.dtype)
        xv = xv + b2[:, None, None, None, :]
    pad = ((0, 0), (1, nx * XT - X + 1), (1, ny * YT - Y + 1),
           (1, ZP - ZH - 1), (0, 0))
    xp = jnp.pad(xv, pad)

    wr = _pack_weights(w, xv.dtype, split=split)
    b_in = (bias if bias is not None else jnp.zeros((F,), xv.dtype))
    b_in = jnp.tile(b_in.astype(xv.dtype), 2).reshape(1, 2 * F)

    in_specs = [
        pl.BlockSpec((9, 4 * C, 2 * F), lambda b, i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2 * F), lambda b, i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    operands = [wr, b_in, xp]
    with_res = residual is not None
    if with_res:
        if (X, Y) != (nx * XT, ny * YT):
            residual = jnp.pad(residual, (
                (0, 0), (0, nx * XT - X), (0, ny * YT - Y), (0, 0), (0, 0)))
        in_specs.append(pl.BlockSpec(
            (1, XT, YT, ZH, 2 * F), lambda b, i, j: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM))
        operands.append(residual)

    out = pl.pallas_call(
        functools.partial(_kernel, XT=XT, YT=YT, ZH=ZH, C=C, F=F, act=act,
                          out_dtype=out_dtype, with_res=with_res,
                          post_act=post_act, split=split),
        grid=(B, nx, ny),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, XT, YT, ZH, 2 * F), lambda b, i, j: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nx * XT, ny * YT, ZH, 2 * F),
                                       out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, XT + 2, YT + 2, ZP, 2 * C), xv.dtype),
            pltpu.VMEM((XT + 2, YT + 2, ZH, (2 if split else 4) * C),
                       xv.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * X * Y * (2 * ZH) * 36 * C * F,
            bytes_accessed=(xp.size + (1 + with_res) * B * X * Y * ZH * 2 * F)
            * xv.dtype.itemsize,
            transcendentals=B * X * Y * ZH * 2 * F
            if "elu" in (act, post_act) else 0,
        ),
        # Tile geometry is NOT a lever here: the round-5 on-chip sweep
        # (tools/ab_tile_sweep.py, full-res b4) measured 24.4 ms/unit at
        # (4,16) vs 24.0 at (8,32) with (8,16)/(4,32)/(16,16)/(8,40) in
        # between -- a 1.6% spread, so the input-halo DMA (69% extra at
        # (4,16)) is fully hidden behind compute and the 46%-of-peak
        # ceiling is the structural 4/3 K-slot inflation plus the VMEM
        # staging stores.  (4,16) from _pick_tiles stays the default.
        interpret=interpret,
    )(*operands)
    return out[:, :X, :Y]


def _conv3x3x3_fused(x, w, bias, pre_scale, pre_shift, *, act="none",
                     out_dtype=None, xt=8, yt=8, interpret=False,
                     split=_SPLIT_STAGING):
    """Unpacked wrapper around the packed core (legacy interface):
    act(conv3d(x * pre_scale + pre_shift, w) + bias), SAME, stride 1.
    x: (B, X, Y, Z, C) with Z even; w: (3,3,3,C,F)."""
    out = _conv3x3x3_fused_p(pack_z(x), w, bias, pre_scale, pre_shift,
                             act=act, out_dtype=out_dtype, xt=xt, yt=yt,
                             interpret=interpret, split=split)
    return unpack_z(out)


def _reference_impl(x, w, bias, pre_scale, pre_shift, act):
    """XLA twin of the fused kernel (used for the VJP and as the
    fallback on non-TPU backends)."""
    if pre_scale is not None:
        x = x * pre_scale[:, None, None, None, :].astype(x.dtype)
    if pre_shift is not None:
        x = x + pre_shift[:, None, None, None, :].astype(x.dtype)
    # no preferred_element_type: the conv transpose rule (used by the
    # custom_vjp backward) requires uniform dtypes, and TPU bf16 convs
    # accumulate in f32 internally anyway
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))
    if bias is not None:
        y = y + bias.astype(y.dtype)
    y = _apply_act(y, act)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def conv3x3x3(x, w, bias, pre_scale, pre_shift, act="none"):
    """Fused act(conv3d(x*scale+shift, w)+bias); channels-last, SAME,
    stride 1.  Pallas forward on TPU, XLA elsewhere; XLA backward."""
    return _dispatch(x, w, bias, pre_scale, pre_shift, act)


def _pick_tiles(x_shape, w_shape, itemsize):
    """First tile config that fits VMEM; (4,16) measured fastest at the
    flagship shapes (10.4 ms vs 23.7 ms at (8,8) -- long y tiles give
    long contiguous DMA spans)."""
    for xt, yt in ((4, 16), (8, 8), (4, 8), (4, 4)):
        if _vmem_estimate(x_shape, w_shape, xt, yt,
                          itemsize=itemsize) < 13 * 2 ** 20:
            return xt, yt
    return None


def _dispatch(x, w, bias, pre_scale, pre_shift, act):
    platform = jax.devices()[0].platform
    Z, C = x.shape[3], x.shape[4]
    tiles = _pick_tiles(x.shape, w.shape, x.dtype.itemsize)
    if (platform in ("tpu", "axon") and Z % 2 == 0 and tiles is not None
            and 2 * C >= 128 and C % 64 == 0):
        return _conv3x3x3_fused(x, w, bias, pre_scale, pre_shift, act=act,
                                xt=tiles[0], yt=tiles[1])
    return _reference_impl(x, w, bias, pre_scale, pre_shift, act)


def _vmem_estimate(x_shape, w_shape, xt=4, yt=16, itemsize=2):
    B, X, Y, Z, C = x_shape
    F = w_shape[-1]
    zh = Z // 2
    zp = -(-(zh + 2) // 8) * 8
    it = itemsize
    stage_c = 2 * C if _SPLIT_STAGING else 4 * C
    # out and w count DOUBLE: Mosaic pipelines the output block and
    # keeps revolving copies of VMEM in_specs blocks -- measured on the
    # f32 full-res unit, the stack allocation runs ~2.9 MB over the
    # single-copy estimate (16.09M actual vs 13.16M estimated at
    # (4,16)), blowing the 16M scoped-vmem limit.
    return (2 * (xt + 2) * (yt + 2) * zp * 2 * C * it      # in_buf x2
            + (xt + 2) * (yt + 2) * zh * stage_c * it      # edge/a4 stage
            + xt * yt * zh * 2 * F * 4                     # acc
            + 2 * xt * yt * zh * 2 * F * it                # out (pipelined)
            + 2 * 9 * 4 * C * 2 * F * it)                  # w (revolving)


def _fwd(x, w, bias, pre_scale, pre_shift, act):
    out = _dispatch(x, w, bias, pre_scale, pre_shift, act)
    # the OUTPUT is saved instead of pre-activation: for every act here
    # act'(y0) is recoverable from y = act(y0) (relu/leaky: sign; elu:
    # exp(y0) = y+1), so the backward needs no extra full-size residual
    return out, (x, w, bias, pre_scale, pre_shift, out)


def _act_grad_from_out(y, act):
    if act == "none":
        return None
    if act == "relu":
        return (y > 0).astype(y.dtype)
    if act == "elu":
        return jnp.where(y > 0, jnp.ones_like(y), y + 1.0)
    if act == "leaky01":
        return jnp.where(y > 0, 1.0, 0.1).astype(y.dtype)
    if act == "leaky001":
        return jnp.where(y > 0, 1.0, 0.01).astype(y.dtype)
    raise ValueError(act)


def _bwd(act, res, g):
    """Fast backward: dz through the SAME fused conv kernel (flipped
    weights -- the transpose of a SAME stride-1 odd conv is a SAME conv
    of the cotangent), dw as 27 huge-K dot_generals (contraction over
    batch x space, MXU-friendly), affine/bias grads as reductions.
    Matches jax.vjp of the XLA reference (gradient-parity tested)."""
    x, w, bias, pre_scale, pre_shift, out = res
    g = g.astype(x.dtype)
    ag = _act_grad_from_out(out, act)
    g0 = g if ag is None else g * ag.astype(g.dtype)
    return _bwd_core(x, w, bias, pre_scale, pre_shift, g0)


def _bwd_core(x, w, bias, pre_scale, pre_shift, g0):
    # dz = conv(g0, flip(w)^T)
    wf = w[::-1, ::-1, ::-1].transpose(0, 1, 2, 4, 3)
    dz = _dispatch(g0, wf.astype(g0.dtype), None, None, None, "none")

    # recompute z = x*a + b (elementwise; fuses into the dw pad)
    z = x
    if pre_scale is not None:
        z = z * pre_scale[:, None, None, None, :].astype(x.dtype)
    if pre_shift is not None:
        z = z + pre_shift[:, None, None, None, :].astype(x.dtype)
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    B, X, Y, Z, C = x.shape
    taps = []
    for i in range(3):
        for j in range(3):
            for k in range(3):
                zs = jax.lax.slice(
                    zp, (0, i, j, k, 0), (B, i + X, j + Y, k + Z, C))
                taps.append(jax.lax.dot_general(
                    zs, g0, (((0, 1, 2, 3), (0, 1, 2, 3)), ((), ())),
                    preferred_element_type=jnp.float32))
    dw = jnp.stack(taps).reshape(3, 3, 3, C, w.shape[-1]).astype(w.dtype)

    dbias = None if bias is None else \
        jnp.sum(g0.astype(jnp.float32), axis=(0, 1, 2, 3)).astype(
            bias.dtype)
    if pre_scale is not None:
        da = jnp.einsum("bxyzc,bxyzc->bc", dz.astype(jnp.float32),
                        x.astype(jnp.float32)).astype(pre_scale.dtype)
        dx = dz * pre_scale[:, None, None, None, :].astype(dz.dtype)
    else:
        da, dx = None, dz
    db = None if pre_shift is None else \
        jnp.sum(dz.astype(jnp.float32), axis=(1, 2, 3)).astype(
            pre_shift.dtype)
    return (dx.astype(x.dtype), dw, dbias, da, db)


conv3x3x3.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Pallas dw kernel: the weight gradient of the packed 3x3x3 conv as one
# tiled VMEM-resident pass.
#
# The XLA block-dot dw (18 dot_generals, see _bwd_p) is HBM-BOUND: every
# dot re-reads both full-size operands (~630 MB/pair at the flagship
# full-res shape), so the dw tower costs ~18 operand reads per layer and
# dominates the Stage-1 backward (train_attribution round 5: G bwd ran
# 3.0x fwd, and cutting dw MACs 2.0x -> 1.33x moved the chain only
# 271.5 -> 264.7 ms).  This kernel tiles over (b, x, y), DMAs the z slab
# and the cotangent tile into VMEM ONCE each, computes all 18 tap-block
# dots from VMEM (the staggered +-1 edge operand staged via the same
# lane-aligned stores as the forward kernel), and accumulates the raw
# (9, 2, 2C, 2F) f32 parity blocks across grid steps -- HBM traffic
# collapses from ~18 reads to 2 per layer.
# ---------------------------------------------------------------------------

# Default ON: on-chip parity vs the block-dot path is exact to f32
# accumulation order (rel 3.4e-7 f32 / 3.7e-7 bf16) and the kernel runs
# the full-res layer's dw in 2.69 ms vs 15.07 ms for the 18 XLA block
# dots (5.6x -- the block dots re-read both full operands from HBM per
# dot; tools/ab_dw_pallas.py, round 5).  GFE_DW_PALLAS=0 restores the
# XLA path.
_DW_PALLAS = os.environ.get("GFE_DW_PALLAS", "1") == "1"


def _dw_vmem_estimate(XT, YT, ZP, GZP, C2, F2, itemsize):
    it = itemsize
    return (2 * (XT + 2) * (YT + 2) * ZP * C2 * it     # z slab x2 (dbuf)
            + 2 * XT * YT * GZP * F2 * it              # g tile x2 (dbuf)
            + (XT + 2) * (YT + 2) * GZP * C2 * it      # staggered u stage
            + 2 * 9 * 2 * C2 * F2 * 4)                 # out blocks (margin)


def _dw_pick_tiles(ZH, C2, F2, itemsize):
    GZP = -(-ZH // 8) * 8
    ZP = -(-(GZP + 2) // 8) * 8
    for xt, yt in ((4, 16), (8, 8), (4, 8), (4, 4), (2, 8), (2, 4)):
        if _dw_vmem_estimate(xt, yt, ZP, GZP, C2, F2,
                             itemsize) < 13 * 2 ** 20:
            return xt, yt
    return None


def _dw_kernel(z_ref, g_ref, out_ref, zbuf, gbuf, ubuf, zsem, gsem, *,
               XT, YT, GZP, C, F):
    """One (b, i, j) tile of the dw reduction.

    zbuf tile: (XT+2, YT+2, ZP, 2C) -- xy halo 1, packed-z rows
    [-1, 0..ZH-1, 0-pad...]; gbuf tile: (XT, YT, GZP, 2F).  Per (dx, dy)
    two sublane-contraction dots: the center operand reads the slab at
    z-row offset 1 directly; the staggered edge operand (z rows n+1
    slot 0 / n-1 slot 1) is staged via two lane-aligned stores.  The
    raw parity blocks accumulate into the revisited out block; the tap
    assembly happens outside in XLA (tiny tensors)."""
    b, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nx, ny, nb = pl.num_programs(1), pl.num_programs(2), pl.num_programs(0)
    step = (b * nx + i) * ny + j
    slot = jax.lax.rem(step, 2)
    C2, F2 = 2 * C, 2 * F

    def start_dma(s, bb, ii, jj):
        pltpu.make_async_copy(
            z_ref.at[bb, pl.ds(ii * XT, XT + 2), pl.ds(jj * YT, YT + 2)],
            zbuf.at[s], zsem.at[s]).start()
        pltpu.make_async_copy(
            g_ref.at[bb, pl.ds(ii * XT, XT), pl.ds(jj * YT, YT)],
            gbuf.at[s], gsem.at[s]).start()

    @pl.when(step == 0)
    def _():
        start_dma(0, b, i, j)

    nj = jax.lax.rem(j + 1, ny)
    carry_i = (j + 1) // ny
    ni_ = jax.lax.rem(i + carry_i, nx)
    nb_ = b + (i + carry_i) // nx

    pltpu.make_async_copy(
        z_ref.at[b, pl.ds(i * XT, XT + 2), pl.ds(j * YT, YT + 2)],
        zbuf.at[slot], zsem.at[slot]).wait()
    pltpu.make_async_copy(
        g_ref.at[b, pl.ds(i * XT, XT), pl.ds(j * YT, YT)],
        gbuf.at[slot], gsem.at[slot]).wait()

    @pl.when(nb_ < nb)
    def _():
        start_dma(1 - slot, nb_, ni_, nj)

    slab = zbuf[slot]
    # staggered edge operand (lane-aligned stores, fwd-kernel pattern)
    ubuf[:, :, :, 0:C] = slab[:, :, 2:GZP + 2, 0:C]
    ubuf[:, :, :, C:C2] = slab[:, :, 0:GZP, C:C2]
    gt = gbuf[slot].reshape(XT * YT * GZP, F2)

    @pl.when(step == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    cd = (((0,), (0,)), ((), ()))
    for dx in range(3):
        for dy in range(3):
            c_op = slab[dx:dx + XT, dy:dy + YT, 1:GZP + 1, :].reshape(
                XT * YT * GZP, C2)
            u_op = ubuf[dx:dx + XT, dy:dy + YT].reshape(XT * YT * GZP, C2)
            t0 = jax.lax.dot_general(c_op, gt, cd,
                                     preferred_element_type=jnp.float32)
            tu = jax.lax.dot_general(u_op, gt, cd,
                                     preferred_element_type=jnp.float32)
            out_ref[dx * 3 + dy, 0] += t0
            out_ref[dx * 3 + dy, 1] += tu


@functools.partial(jax.jit, static_argnames=("xt", "yt", "interpret"))
def _dw_pallas_p(z, g1, *, xt=4, yt=16, interpret=False):
    """Packed-conv weight gradient in one Pallas pass.

    z: (B, X, Y, ZH, 2C) GN-applied packed input; g1: (B, X, Y, ZH, 2F)
    packed cotangent (post act-grad).  Returns dw (3, 3, 3, C, F) f32.
    Matches the XLA block-dot formulation in _bwd_p exactly (same
    parity-block decomposition; parity tested in interpret mode and
    on-chip)."""
    B, X, Y, ZH, C2 = z.shape
    F2 = g1.shape[-1]
    C, F = C2 // 2, F2 // 2
    XT, YT = xt, yt
    nx, ny = pl.cdiv(X, XT), pl.cdiv(Y, YT)
    GZP = -(-ZH // 8) * 8
    ZP = -(-(GZP + 2) // 8) * 8
    zp = jnp.pad(z, ((0, 0), (1, nx * XT - X + 1), (1, ny * YT - Y + 1),
                     (1, ZP - ZH - 1), (0, 0)))
    gp = jnp.pad(g1, ((0, 0), (0, nx * XT - X), (0, ny * YT - Y),
                      (0, GZP - ZH), (0, 0)))
    raw = pl.pallas_call(
        functools.partial(_dw_kernel, XT=XT, YT=YT, GZP=GZP, C=C, F=F),
        grid=(B, nx, ny),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((9, 2, C2, F2), lambda b, i, j: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9, 2, C2, F2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, XT + 2, YT + 2, ZP, C2), z.dtype),
            pltpu.VMEM((2, XT, YT, GZP, F2), g1.dtype),
            pltpu.VMEM((XT + 2, YT + 2, GZP, C2), z.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=36 * B * nx * XT * ny * YT * GZP * C2 * F2,
            bytes_accessed=(zp.size * zp.dtype.itemsize
                            + gp.size * gp.dtype.itemsize
                            + 9 * 2 * C2 * F2 * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(zp, gp)
    t0, tu = raw[:, 0], raw[:, 1]
    dk_m = t0[:, :C, F:] + tu[:, C:, :F]            # fine offset -1
    dk_0 = t0[:, :C, :F] + t0[:, C:, F:]            # fine offset  0
    dk_p = t0[:, C:, :F] + tu[:, :C, F:]            # fine offset +1
    return jnp.stack([dk_m, dk_0, dk_p], axis=1).reshape(3, 3, 3, C, F)


def _group_fold(mu_c, ex2_c, num_groups: int, eps: float):
    """Per-channel means -> per-channel (mu, rstd) of the channel's
    group (equal weights within a group -> exact)."""
    B, C = mu_c.shape
    per = C // num_groups
    mu = mu_c.reshape(B, num_groups, per).mean(-1)  # (B, G)
    ex2 = ex2_c.reshape(B, num_groups, per).mean(-1)
    rstd = jax.lax.rsqrt(ex2 - mu * mu + eps)
    return (jnp.repeat(mu, per, axis=-1),
            jnp.repeat(rstd, per, axis=-1))


def group_norm_stats(x: Array, num_groups: int, eps: float = 1e-5):
    """Per-(batch, channel) GN affine folded with (gamma, beta) left to
    the caller: returns (mu, rstd) each (B, C) in f32, exactly the
    torch/flax GroupNorm statistics (reduce over spatial dims and the
    channels of each group)."""
    spatial = tuple(range(1, x.ndim - 1))
    # reduce per-channel FIRST (keeps the minor dim C -- a big
    # (..., G, per) reshape materializes with 16x tile padding on TPU),
    # then average channels within each group
    xf = x.astype(jnp.float32)
    mu_c = xf.mean(axis=spatial)                    # (B, C)
    ex2_c = (xf * xf).mean(axis=spatial)
    return _group_fold(mu_c, ex2_c, num_groups, eps)


def group_norm_stats_p(xp: Array, num_groups: int, eps: float = 1e-5):
    """:func:`group_norm_stats` over a z-pair-packed (B,X,Y,ZH,2C)
    tensor: channel c lives at lanes c and C+c; per-lane means combine
    exactly (both halves hold Z/2 of the Z spatial samples)."""
    C = xp.shape[-1] // 2
    xf = xp.astype(jnp.float32)
    m2 = xf.mean(axis=(1, 2, 3))                    # (B, 2C)
    e2 = (xf * xf).mean(axis=(1, 2, 3))
    mu_c = 0.5 * (m2[:, :C] + m2[:, C:])
    ex2_c = 0.5 * (e2[:, :C] + e2[:, C:])
    return _group_fold(mu_c, ex2_c, num_groups, eps)


# --------------------------------------------------------------------------
# Packed-domain public ops: the whole fused path flows z-pair packed
# (B, X, Y, Z//2, 2C) so every materialized buffer is lane-full.
# Round-3 fix for the dec2/enc1 glue (PERF_NOTES "Round 3").
# --------------------------------------------------------------------------

def _reference_impl_p(xv, w, bias, pre_scale, pre_shift, residual, act,
                      post_act):
    """XLA twin of the packed fused unit (non-TPU fallback + VJP
    reference)."""
    y = _reference_impl(unpack_z(xv), w, bias, pre_scale, pre_shift, act)
    y = pack_z(y)
    if residual is not None:
        y = y + residual.astype(y.dtype)
    return _apply_act(y, post_act).astype(xv.dtype)


# Lower the 1-channel stem conv (enc1's conv2: the only packed call
# with C2 == 2) as an im2col dot instead of lax.conv: XLA's TPU conv
# at C_in=1 is lane-starved (1 live MXU lane of 128) and picks hostile
# layouts for the full-res output.  Flag for on-chip A/B.
_STEM_IM2COL = True


def _stem_impl_p(xv, w, bias, pre_scale, pre_shift, residual, act,
                 post_act):
    """Packed im2col stem: C_in=1 3x3x3 conv as one lane-dense dot.

    Patches: 27 shifted (dx, dy, dpair) slices of the z-pair-packed
    input concatenated on the lane dim -> (B, X, Y, P, 54); each slice
    carries both z-slots of pair p+dp-1, so the 54 lanes cover fine-z
    offsets {2p-2..2p+3} -- a superset of the three taps either output
    slot needs.  The (54, 2F) weight matrix scatters w[dx,dy,dz] to the
    (row=(dx,dy,dp,slot), col=(slot',co)) positions that realize
    z_out + dz - 1 = 2*(p + dp - 1) + slot, writing the packed
    (B, X, Y, P, 2F) output directly (no (..., Z, F) lane-pad stop).
    K pads 54->128 on the MXU (2.4x on ~1/64 of a 64->64 unit's FLOPs
    -- noise) and the patch buffer is the only extra HBM traffic."""
    B, X, Y, P, C2 = xv.shape
    F = w.shape[-1]
    if pre_scale is not None:
        xv = xv * jnp.tile(pre_scale, (1, 2))[
            :, None, None, None, :].astype(xv.dtype)
    if pre_shift is not None:
        xv = xv + jnp.tile(pre_shift, (1, 2))[
            :, None, None, None, :].astype(xv.dtype)
    xp = jnp.pad(xv, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [xp[:, dx:dx + X, dy:dy + Y, dp:dp + P, :]
         for dx in range(3) for dy in range(3) for dp in range(3)], -1)
    wdt = w.astype(xv.dtype)
    wm = jnp.zeros((27 * C2, 2 * F), xv.dtype)
    for dx in range(3):
        for dy in range(3):
            for dz in range(3):
                # even slot (z = 2p): tap z+dz-1 = 2(p+dp-1)+slot
                dp, slot = divmod(dz - 1 + 2, 2)       # offsets vs p-1
                row = ((dx * 3 + dy) * 3 + dp) * 2 + slot
                wm = wm.at[row, :F].set(wdt[dx, dy, dz, 0])
                # odd slot (z = 2p+1): tap z+dz = 2(p+dp-1)+slot
                dp, slot = divmod(dz + 2, 2)
                row = ((dx * 3 + dy) * 3 + dp) * 2 + slot
                wm = wm.at[row, F:].set(wdt[dx, dy, dz, 0])
    y = jax.lax.dot_general(cols, wm, (((4,), (0,)), ((), ())))
    if bias is not None:
        y = y + jnp.tile(bias, 2).astype(y.dtype)
    y = _apply_act(y, act)
    if residual is not None:
        y = y + residual.astype(y.dtype)
    return _apply_act(y, post_act).astype(xv.dtype)


def _dispatch_p(xv, w, bias, pre_scale, pre_shift, residual, act, post_act):
    platform = jax.devices()[0].platform
    B, X, Y, ZH, C2 = xv.shape
    C = C2 // 2
    tiles = _pick_tiles((B, X, Y, 2 * ZH, C), w.shape, xv.dtype.itemsize)
    if (platform in ("tpu", "axon") and tiles is not None
            and C2 >= 128 and C % 64 == 0):
        return _conv3x3x3_fused_p(xv, w, bias, pre_scale, pre_shift,
                                  residual, act=act, post_act=post_act,
                                  xt=tiles[0], yt=tiles[1])
    if (_STEM_IM2COL and C2 == 2
            and platform in ("tpu", "axon")):
        return _stem_impl_p(xv, w, bias, pre_scale, pre_shift, residual,
                            act, post_act)
    return _reference_impl_p(xv, w, bias, pre_scale, pre_shift, residual,
                             act, post_act)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def conv3x3x3_p(xv, w, bias, pre_scale, pre_shift, residual=None,
                act="none", post_act="none"):
    """Packed fused unit: ``post_act(act(conv3d(x*scale+shift, w)
    + bias) + residual)`` with all tensor IO z-pair packed
    (B, X, Y, Z//2, 2C).  Pallas forward on TPU, XLA elsewhere.

    ``act != 'none'`` may not be combined with a residual/post_act
    epilogue: the backward recovers act' from the saved OUTPUT, and
    un-doing the epilogue first re-introduces float noise around relu's
    exact zeros (sign-flipped gradients).  The ResNetBlock uses only
    the two supported shapes: GN+conv+act (conv2) and
    GN+conv+residual+post_act (conv3, act stripped)."""
    if act != "none" and (residual is not None or post_act != "none"):
        raise ValueError(
            "conv3x3x3_p: act together with residual/post_act is "
            "unsupported (compose a plain-act call with an XLA epilogue "
            "instead)")
    return _dispatch_p(xv, w, bias, pre_scale, pre_shift, residual, act,
                       post_act)


def _fwd_p(xv, w, bias, pre_scale, pre_shift, residual, act, post_act):
    out = _dispatch_p(xv, w, bias, pre_scale, pre_shift, residual, act,
                      post_act)
    return out, (xv, w, bias, pre_scale, pre_shift, residual, out)


def _bwd_p(act, post_act, res, g):
    """Packed-NATIVE backward: every tensor stays z-pair packed.

    dz rides the same packed fused kernel with flipped/transposed
    weights; dw comes from 18 (2C, 2F) block dots over packed operands
    -- the packed-row offset m and the intra-row parities (h1, h2)
    jointly enumerate the fine-z tap offsets 2m + h1 - h2 in {-1,0,1}.
    The same-row dot t0 (m = 0) is FULLY used: its four parity blocks
    are the two halves of tap 0 plus the same-row halves of taps -1 and
    +1.  The two cross-row halves (m = +-1) used to be two more dots
    with one live block each (12 blocks computed / 6 used = 2.0x the
    useful MACs); they now share ONE staggered operand ``u`` whose
    lanes pair z rows n+1 (slot 0, lanes [0, C)) with rows n-1 (slot 1,
    lanes [C, 2C)) -- both lane-ALIGNED row shifts, built once since
    the z stagger is (dx, dy)-independent -- so dot(u, g) carries both
    edge blocks at once: 8 blocks computed / 6 used = 1.33x, i.e. dw
    costs one forward-conv-equivalent of MXU work instead of two
    (train_attribution round 5: the Stage-1 bwd premium was exactly
    this)."""
    xv, w, bias, pre_scale, pre_shift, residual, out = res
    g = g.astype(xv.dtype)
    pag = _act_grad_from_out(out, post_act)
    g2 = g if pag is None else g * pag.astype(g.dtype)
    dres = g2 if residual is not None else None
    # act and (residual | post_act) are mutually exclusive (see
    # conv3x3x3_p), so act' is recoverable directly from the output
    ag = _act_grad_from_out(out, act) if act != "none" else None
    g1 = g2 if ag is None else g2 * ag.astype(g2.dtype)

    B, X, Y, ZH, C2 = xv.shape
    C = C2 // 2
    F = w.shape[-1]

    # dz = conv(g1, flip(w)^T), packed end to end
    wf = w[::-1, ::-1, ::-1].transpose(0, 1, 2, 4, 3)
    dz = _dispatch_p(g1, wf.astype(g1.dtype), None, None, None, None,
                     "none", "none")

    # zhat = x*a + b in the packed domain (fuses into the dot pads)
    z = xv
    if pre_scale is not None:
        z = z * jnp.tile(pre_scale, (1, 2)).astype(
            xv.dtype)[:, None, None, None, :]
    if pre_shift is not None:
        z = z + jnp.tile(pre_shift, (1, 2)).astype(
            xv.dtype)[:, None, None, None, :]
    platform = jax.devices()[0].platform
    dw_tiles = _dw_pick_tiles(ZH, C2, 2 * F, xv.dtype.itemsize)
    if (_DW_PALLAS and platform in ("tpu", "axon") and C % 64 == 0
            and C2 >= 128 and F % 64 == 0 and dw_tiles is not None):
        dw = _dw_pallas_p(z, g1, xt=dw_tiles[0],
                          yt=dw_tiles[1]).astype(w.dtype)
    else:
        dw = _dw_blockdot_p(z, g1).astype(w.dtype)
    return _bwd_p_rest(xv, w, bias, pre_scale, pre_shift, residual,
                       dz, dw, g1, dres, C, F)


def _dw_blockdot_p(z, g1):
    """XLA block-dot dw over packed operands (18 dots; see _bwd_p
    docstring for the parity-block algebra).  Shared by _bwd_p's
    fallback path and tools/ab_dw_pallas.py."""
    B, X, Y, ZH, C2 = z.shape
    C, F = C2 // 2, g1.shape[-1] // 2
    # xy halo 1 on both operand variants; the staggered edge operand u
    # pairs z rows n+1 (slot 0) with rows n-1 (slot 1) -- lane-aligned
    # shifts with a zero row at each respective boundary
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    u = jnp.concatenate([
        jnp.pad(z[:, :, :, 1:, :C],
                ((0, 0), (0, 0), (0, 0), (0, 1), (0, 0))),
        jnp.pad(z[:, :, :, :-1, C:],
                ((0, 0), (0, 0), (0, 0), (1, 0), (0, 0))),
    ], axis=-1)
    up = jnp.pad(u, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))

    cdims = (((0, 1, 2, 3), (0, 1, 2, 3)), ((), ()))

    def blockdot(a, b):
        return jax.lax.dot_general(a, b, cdims,
                                   preferred_element_type=jnp.float32)

    taps = []
    for i in range(3):
        for j in range(3):
            zs = jax.lax.slice(zp, (0, i, j, 0, 0),
                               (B, i + X, j + Y, ZH, C2))
            us = jax.lax.slice(up, (0, i, j, 0, 0),
                               (B, i + X, j + Y, ZH, C2))
            t0 = blockdot(zs, g1)            # m=0: all 4 blocks live
            tu = blockdot(us, g1)            # m=+-1 edge blocks
            dk_m = t0[:C, F:] + tu[C:, :F]          # fine offset -1
            dk_0 = t0[:C, :F] + t0[C:, F:]          # fine offset  0
            dk_p = t0[C:, :F] + tu[:C, F:]          # fine offset +1
            taps.append(jnp.stack([dk_m, dk_0, dk_p]))
    return jnp.stack(taps).reshape(3, 3, 3, C, F)


def _bwd_p_rest(xv, w, bias, pre_scale, pre_shift, residual, dz, dw, g1,
                dres, C, F):
    """Shared tail of the packed backward: dbias and the pre-affine
    (scale, shift) gradients, downstream of whichever dw path ran."""
    dbias = None
    if bias is not None:
        s = jnp.sum(g1.astype(jnp.float32), axis=(0, 1, 2, 3))
        dbias = (s[:F] + s[F:]).astype(bias.dtype)
    if pre_scale is not None:
        e2 = jnp.einsum("bxyzc,bxyzc->bc", dz.astype(jnp.float32),
                        xv.astype(jnp.float32))
        da = (e2[:, :C] + e2[:, C:]).astype(pre_scale.dtype)
        dx = dz * jnp.tile(pre_scale, (1, 2)).astype(
            dz.dtype)[:, None, None, None, :]
    else:
        da, dx = None, dz
    db = None
    if pre_shift is not None:
        s = jnp.sum(dz.astype(jnp.float32), axis=(1, 2, 3))
        db = (s[:, :C] + s[:, C:]).astype(pre_shift.dtype)
    return (dx.astype(xv.dtype), dw, dbias, da, db, dres)


conv3x3x3_p.defvjp(_fwd_p, _bwd_p)


def deconv3x3x3_s2_packed(xp: Array, w: Array) -> Array:
    """k=3 stride-2 transposed conv with flax
    ``ConvTranspose(padding=[(1, 0)])`` semantics (2n outputs), packed
    IO -- the octant decomposition.

    A transposed conv's output positions split by parity into 8 octant
    classes, each an ordinary stride-1 conv with a 1-2 tap kernel slice:
    ``out[o] = sum_k w[k] x[(o+k-1)/2]`` per axis, so even outputs read
    tap k=1 (shift 0) and odd outputs taps k=0 (shift 0) + k=2
    (shift +1).  Each class is a handful of huge-M channel dots (MXU)
    and the two z parities land directly in the packed output lanes --
    no full-resolution (.., Z, C) buffer ever materializes.  Replaces
    XLA's lhs-dilated conv lowering, which cost ~110 ms of the 160 ms
    dec2 segment at batch 4 (PERF_NOTES round 3).

    xp: (B, X, Y, ZH, 2*Ci); w: (3, 3, 3, Ci, Co) (the flax
    ConvTranspose kernel, unchanged).  Returns (B, 2X, 2Y, 2*ZH, 2*Co)
    packed, i.e. fine shape (2X, 2Y, 4*ZH... the fine z doubles: output
    packed rows equal the input's fine z extent.
    """
    x = unpack_z(xp)                     # free bitcast at Ci >= 64
    B, X, Y, Z, Ci = x.shape
    Co = w.shape[-1]
    dt = xp.dtype
    # one 2x2x2 conv to 8*Co channels + depth-to-space: the 27 taps
    # distribute over the (shift, parity) kernel W'[s, ci, (p, co)]
    # with per-axis fills (s=0,p=0)<-k1, (s=0,p=1)<-k0, (s=1,p=1)<-k2.
    # 27/64 slots are non-zero (2.37x FLOP inflation on ~5% of the
    # model's FLOPs) but everything runs as ONE lane-full MXU conv --
    # the 27-separate-dot formulation materialized 27 f32 partials
    # (~40 ms of HBM traffic at the dec2 shape).
    A = ((0, 0, 1), (0, 1, 0), (1, 1, 2))   # (shift, parity, tap)
    w4 = jnp.zeros((2, 2, 2, Ci, 2, 2, 2, Co), dt)
    wt = w.astype(dt)
    for sx, px, kx in A:
        for sy, py, ky in A:
            for sz, pz, kz in A:
                w4 = w4.at[sx, sy, sz, :, px, py, pz, :].set(
                    wt[kx, ky, kz])
    W = w4.reshape(2, 2, 2, Ci, 8 * Co)
    xpad = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xpad, W, (1, 1, 1), "VALID",
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))
    # (B, X, Y, Z, px, py, 2*Co) -> interleave x/y parities; the (pz,
    # co) minor pair IS the packed-z lane layout already
    y = y.reshape(B, X, Y, Z, 2, 2, 2 * Co)
    o = y.transpose(0, 1, 4, 2, 5, 3, 6).reshape(B, 2 * X, 2 * Y, Z,
                                                 2 * Co)
    return o


def _pool_pair(x, op, init) -> Array:
    B, X, Y, ZH, C2 = x.shape
    C = C2 // 2
    # init must be a plain Python scalar: a traced/array init makes
    # jax.checkpoint's linearization fail ("unknown output primals")
    t = jax.lax.reduce_window(
        x, init, op, (1, 2, 2, 1, 1), (1, 2, 2, 1, 1), "VALID")
    # fine-z window 2 stride 2 == the two halves of one packed row
    u = op(t[..., :C], t[..., C:])                  # (B,X/2,Y/2,ZH,C)
    return u.reshape(B, X // 2, Y // 2, ZH // 2, C2)


def max_pool_packed(xp: Array) -> Array:
    """2x2x2 stride-2 max pool in the packed domain (ZH must be even)."""
    assert xp.shape[3] % 2 == 0, "packed max pool needs even ZH"
    return _pool_pair(xp, jax.lax.max, -jnp.inf)


def avg_pool_packed(xp: Array) -> Array:
    """2x2x2 stride-2 average pool in the packed domain (f32 accum)."""
    assert xp.shape[3] % 2 == 0, "packed avg pool needs even ZH"
    out = _pool_pair(xp.astype(jnp.float32), jax.lax.add, 0.0)
    return (out / 8.0).astype(xp.dtype)


def fused_gn_conv_act(x: Array, *, num_groups: int, gamma: Array,
                      beta: Array, w: Array, bias: Optional[Array],
                      act: str = "none", eps: float = 1e-5) -> Array:
    """act(conv3d(GroupNorm(x; gamma, beta), w) + bias) -- the 'g c ?'
    unit of the reference order DSL (buildingblocks.py:89-115) as one
    fused op."""
    mu, rstd = group_norm_stats(x, num_groups, eps)
    a = rstd * gamma.astype(jnp.float32)[None, :]       # (B, C)
    b = beta.astype(jnp.float32)[None, :] - mu * a
    return conv3x3x3(x, w, bias, a, b, act)
