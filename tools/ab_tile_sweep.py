#!/usr/bin/env python
"""Sweep the fused conv3d kernel's (xt, yt) tile sizes on the TPU.

The kernel's halo (XT+2, YT+2) staging inflates input DMA + staging
stores by (XT+2)(YT+2)/(XT*YT) - 1 -- 69% at the historical (4, 16)
default, 33% at (8, 32).  With the Mosaic scoped-VMEM cap raised
(conv3d.py compiler_params), larger tiles become legal; this tool
times a 6-unit chain per candidate at the flagship full-res and
half-res shapes using the two-point in-executable chain slope
(tools/chain_probe.py methodology).

Usage: python tools/ab_tile_sweep.py [--batch 4] [--k 6] [--iters 6]
       [--shape full|half]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--k", type=int, default=6)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--shape", choices=("full", "half"), default="full")
    p.add_argument("--tiles", default=None,
                   help="comma list like 4x16,8x32 (default: built-in)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from gfe_mamba_tpu.ops.pallas.conv3d import _conv3x3x3_fused_p, pack_z

    if args.shape == "full":
        B, X, Y, Z, C = args.batch, 160, 160, 96, 64
    else:
        B, X, Y, Z, C = args.batch, 80, 80, 48, 128
    F = C
    flops = 2 * B * X * Y * Z * 27 * C * F

    xv = jax.device_put(pack_z(
        (jnp.arange(B * X * Y * Z * C, dtype=jnp.float32) % 7 - 3)
        .astype(jnp.bfloat16).reshape(B, X, Y, Z, C) * 0.1))
    w = jax.device_put((jnp.arange(27 * C * F, dtype=jnp.float32) % 5 - 2)
                       .astype(jnp.bfloat16).reshape(3, 3, 3, C, F) * 0.02)
    bias = jnp.zeros((F,), jnp.bfloat16)
    a = jnp.full((B, C), 1.01, jnp.bfloat16)
    bsh = jnp.full((B, C), 0.01, jnp.bfloat16)

    if args.tiles:
        cands = [tuple(int(v) for v in t.split("x"))
                 for t in args.tiles.split(",")]
    elif args.shape == "full":
        cands = [(4, 16), (8, 16), (4, 32), (8, 32), (16, 16), (8, 40)]
    else:
        cands = [(4, 16), (8, 16), (4, 32), (8, 32), (16, 16)]

    for xt, yt in cands:
        def make(kk, xt=xt, yt=yt):
            @jax.jit
            def fn(xv, w, s):
                y = xv
                for _ in range(kk):
                    y = _conv3x3x3_fused_p(y, w, bias, a, bsh,
                                           act="relu", xt=xt, yt=yt)
                    y = y * (1.0 / 16.0)
                return jnp.sum(y.astype(jnp.float32)) * s
            return fn

        k_lo, k_hi = max(1, args.k // 4), args.k
        try:
            fns = {k: make(k) for k in (k_lo, k_hi)}
            ts = {}
            for k, fn in fns.items():
                vals = [float(fn(xv, w, np.float32(i + 1))) for i in range(2)]
                t0 = time.perf_counter()
                out = [fn(xv, w, np.float32(100 + i))
                       for i in range(args.iters)]
                out = [float(v) for v in out]
                ts[k] = (time.perf_counter() - t0) / args.iters
                assert all(np.isfinite(v) for v in out)
        except Exception as e:
            print(f"tile=({xt:3d},{yt:3d})  FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}")
            continue
        per_unit = (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo)
        tfs = flops / per_unit / 1e12
        print(f"tile=({xt:3d},{yt:3d})  {per_unit * 1e3:7.2f} ms/unit  "
              f"{tfs:6.1f} TF/s ({100 * tfs / PEAK_TFLOPS:.1f}% dense peak)")


if __name__ == "__main__":
    main()
