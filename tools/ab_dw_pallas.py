#!/usr/bin/env python
"""A/B the packed-conv weight-gradient paths on the TPU.

Compares the Pallas VMEM-resident dw kernel (ops/pallas/conv3d.py
``_dw_pallas_p``: one pass, z slab + cotangent DMA'd once, all 18
tap-block dots from VMEM) against the XLA block-dot formulation
(``_dw_blockdot_p``: 18 dot_generals, each re-reading both full-size
operands from HBM), at the flagship full-res packed layer shape.
Methodology: two-point in-executable chain slope (tools/chain_probe.py
docstring -- the only timing that survives the tunnel's ~32 ms fixed
dispatch overhead).

Also runs an ON-CHIP numeric parity check (f32 + bf16) at a reduced
shape first -- the gate ``GFE_DW_PALLAS`` stays off until this passes
on real hardware (interpret-mode parity already holds:
tests/test_pallas_conv3d.py).

Usage: python tools/ab_dw_pallas.py [--batch 1] [--k 6] [--iters 6]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PEAK_TFLOPS = 197.0  # v5e bf16
HBM_GBS = 819.0      # v5e HBM bandwidth


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--k", type=int, default=6)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--skip-parity", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from gfe_mamba_tpu.ops.pallas.conv3d import (
        _dw_blockdot_p, _dw_pallas_p, _dw_pick_tiles)

    # ---- on-chip parity (reduced shape, f32 then bf16) ----
    if not args.skip_parity:
        for dt, tol in ((jnp.float32, 5e-5), (jnp.bfloat16, 2e-2)):
            key = jax.random.key(0)
            kz, kg = jax.random.split(key)
            z = jax.random.normal(kz, (1, 32, 32, 16, 128), dt)
            g = jax.random.normal(kg, (1, 32, 32, 16, 128), dt)
            ref = np.asarray(_dw_blockdot_p(z, g))
            got = np.asarray(_dw_pallas_p(z, g, xt=4, yt=16))
            rel = (np.abs(got - ref).max()
                   / max(np.abs(ref).max(), 1e-30))
            status = "OK" if rel < tol else "FAIL"
            print(f"parity {np.dtype(dt).name:8s} rel={rel:.3e}  {status}",
                  flush=True)
            if rel >= tol:
                sys.exit(1)

    # ---- chain-slope timing at the flagship full-res layer ----
    B, X, Y, ZH, C2 = args.batch, 160, 160, 48, 128
    F2 = 128
    C, F = C2 // 2, F2 // 2
    # useful dw MACs = one forward conv equivalent (PERF_NOTES round 5)
    flops = 2 * B * X * Y * (2 * ZH) * 27 * C * F
    nbytes = (B * X * Y * ZH * (C2 + F2)) * 2  # both operands, bf16

    z = jax.device_put(
        (jnp.arange(B * X * Y * ZH * C2, dtype=jnp.float32) % 7 - 3)
        .astype(jnp.bfloat16).reshape(B, X, Y, ZH, C2) * 0.1)
    g = jax.device_put(
        (jnp.arange(B * X * Y * ZH * F2, dtype=jnp.float32) % 5 - 2)
        .astype(jnp.bfloat16).reshape(B, X, Y, ZH, F2) * 0.1)

    def timed(fn, *ops):
        vals = [float(fn(*ops, np.float32(i + 1))) for i in range(2)]
        t0 = time.perf_counter()
        vals = [fn(*ops, np.float32(100 + i)) for i in range(args.iters)]
        vals = [float(v) for v in vals]
        dt = (time.perf_counter() - t0) / args.iters
        assert all(np.isfinite(v) for v in vals)
        assert len(set(vals)) == args.iters
        return dt

    xt, yt = _dw_pick_tiles(ZH, C2, F2, 2) or (4, 16)
    print(f"tiles: xt={xt} yt={yt}", flush=True)

    variants = [
        ("pallas", lambda zz, gg: _dw_pallas_p(zz, gg, xt=xt, yt=yt)),
        ("blockdot", _dw_blockdot_p),
    ]
    for name, dw_fn in variants:
        def make(kk, dw_fn=dw_fn):
            @jax.jit
            def fn(z, g, s):
                acc = s.astype(jnp.float32)
                for _ in range(kk):
                    gg = g * (1 + acc * 1e-12).astype(g.dtype)
                    dw = dw_fn(z, gg)
                    acc = (jnp.sum(dw[0, 0, 0, 0, :8].astype(jnp.float32))
                           * 1e-20 + s)
                return acc
            return fn

        k_lo, k_hi = max(1, args.k // 4), args.k
        t_lo = timed(make(k_lo), z, g)
        t_hi = timed(make(k_hi), z, g)
        dt = (t_hi - t_lo) / (k_hi - k_lo)
        tf = flops / dt / 1e12
        gbs = nbytes / dt / 1e9
        print(f"dw {name:9s} {dt*1e3:8.2f} ms/layer  {tf:6.1f} TF/s "
              f"({100*tf/PEAK_TFLOPS:.1f}% peak)  "
              f"operand-read BW {gbs:6.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
