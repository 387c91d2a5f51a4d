#!/usr/bin/env python
"""A/B the conv3d kernel staging layouts on the TPU.

Times the packed fused unit (GN-affine + 3x3x3 conv + act) at the
flagship full-res shape with split staging (center block dotted
straight from the slab) vs the full-4C staging layout, using the
two-point in-executable chain slope (the only valid methodology
through the axon tunnel -- see tools/chain_probe.py docstring).

Usage: python tools/ab_split_staging.py [--batch 4] [--k 6] [--iters 6]
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
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from gfe_mamba_tpu.ops.pallas.conv3d import _conv3x3x3_fused_p, pack_z

    B, X, Y, Z, C = args.batch, 160, 160, 96, 64
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

    def timed(fn, *ops):
        vals = [float(fn(*ops, np.float32(i + 1))) for i in range(2)]
        t0 = time.perf_counter()
        vals = [fn(*ops, np.float32(100 + i)) for i in range(args.iters)]
        vals = [float(v) for v in vals]
        dt = (time.perf_counter() - t0) / args.iters
        assert all(np.isfinite(v) for v in vals)
        assert len(set(vals)) == args.iters
        return dt

    for split in ("aligned", True, False):
        def make(kk, split=split):
            @jax.jit
            def fn(xv, w, s):
                y = xv
                for _ in range(kk):
                    y = _conv3x3x3_fused_p(y, w, bias, a, bsh,
                                           act="relu", xt=4, yt=16,
                                           split=split)
                    y = y * (1.0 / 16.0)
                return jnp.sum(y.astype(jnp.float32)) * s
            return fn

        k_lo, k_hi = max(1, args.k // 4), args.k
        t_lo = timed(make(k_lo), xv, w)
        t_hi = timed(make(k_hi), xv, w)
        dt = (t_hi - t_lo) / (k_hi - k_lo)
        tf = flops / dt / 1e12
        print(f"split={split!s:5s}  {dt*1e3:8.2f} ms/unit  {tf:6.1f} TF/s "
              f"({100*tf/PEAK_TFLOPS:.1f}% dense peak)", flush=True)


if __name__ == "__main__":
    main()
