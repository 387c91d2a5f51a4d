#!/usr/bin/env python
"""A/B the dw path inside a single packed-unit fwd+bwd on the TPU.

The isolated dw A/B (tools/ab_dw_pallas.py) showed 2.69 vs 15.07 ms
per full-res layer, but the full G-loss chain moved only ~2 ms
(tools/train_attribution.py).  This probe bisects: chain
value_and_grad of ONE packed fused unit (GN-affine + conv + relu) at
the flagship full-res layer shape, with the Pallas dw kernel on vs
off, via lax.scan (unrolled fwd+bwd chains crash the TPU fusion
emitter -- PERF_NOTES round 5).

Usage: python tools/ab_dw_unit.py [--k 6] [--iters 6]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=6)
    p.add_argument("--iters", type=int, default=6)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from gfe_mamba_tpu.ops.pallas import conv3d as c3

    B, X, Y, ZH, C2 = 1, 160, 160, 48, 128
    C = C2 // 2
    F = C
    xv = jax.device_put(
        (jnp.arange(B * X * Y * ZH * C2, dtype=jnp.float32) % 7 - 3)
        .astype(jnp.bfloat16).reshape(B, X, Y, ZH, C2) * 0.1)
    w = jax.device_put((jnp.arange(27 * C * F, dtype=jnp.float32) % 5 - 2)
                       .astype(jnp.bfloat16).reshape(3, 3, 3, C, F) * 0.02)
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

    for use_pallas in (True, False):
        c3._DW_PALLAS = use_pallas

        def make(kk):
            @jax.jit
            def fn(w, xv, s):
                def body(acc, i):
                    def loss(w):
                        y = c3.conv3x3x3_p(
                            xv * (1 + (acc + i) * 1e-12).astype(xv.dtype),
                            w, None, a, bsh, None, "relu", "none")
                        return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6
                    l, dw = jax.value_and_grad(loss)(w)
                    return acc + l + jnp.sum(dw.astype(jnp.float32)
                                             [0, 0, 0, 0, :8]) * 1e-12, None
                acc, _ = jax.lax.scan(body, s.astype(jnp.float32),
                                      jnp.arange(kk))
                return acc
            return fn

        k_lo, k_hi = 1, args.k
        t_lo = timed(make(k_lo), w, xv)
        t_hi = timed(make(k_hi), w, xv)
        dt = (t_hi - t_lo) / (k_hi - k_lo)
        print(f"unit fwd+bwd  pallas_dw={use_pallas!s:5s} "
              f"{dt*1e3:8.2f} ms/link", flush=True)


if __name__ == "__main__":
    main()
