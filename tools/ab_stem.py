#!/usr/bin/env python
"""A/B the enc1 stem lowering (im2col dot vs XLA conv twin) on-chip.

Times the packed C_in=1 stem unit (GN-fold + 3x3x3 conv 1->64 + relu)
at the flagship full-res shape under both ``_STEM_IM2COL`` settings
with the two-point in-executable chain slope (tools/chain_probe.py
docstring).  The chain feeds each unit's output back through a 64->1
lane reduction so consecutive units stay data-dependent.

Usage: python tools/ab_stem.py [--batch 4] [--k 6] [--iters 6]
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

    from gfe_mamba_tpu.ops.pallas import conv3d

    B, X, Y, Z, F = args.batch, 160, 160, 96, 64
    key = jax.random.key(0)
    w = jax.random.normal(key, (3, 3, 3, 1, F), jnp.bfloat16) * 0.1
    red = jax.random.normal(jax.random.fold_in(key, 1),
                            (2 * F, 2), jnp.bfloat16) * 0.05
    print(f"platform={jax.devices()[0].platform} "
          f"B={B} XYZ={X}x{Y}x{Z} F={F}")

    def make_chain(kk):
        @jax.jit
        def fn(w, red, salt):
            xv = (jax.random.normal(
                jax.random.fold_in(jax.random.key(2),
                                   salt.astype(jnp.int32)),
                (B, X, Y, Z // 2, 2), jnp.bfloat16))

            def body(x, _):
                s = jnp.ones((B, 1), jnp.float32)
                t = jnp.zeros((B, 1), jnp.float32)
                y = conv3d.conv3x3x3_p(x, w, None, s, t, None, "relu")
                # 128->2 lane reduction keeps units data-dependent
                return jnp.tanh(y @ red), y[0, 0, 0, 0, 0]
            x, outs = jax.lax.scan(body, xv, None, length=kk)
            return outs[-1].astype(jnp.float32)
        return lambda s: fn(w, red, jnp.float32(s))

    for flag in (False, True):
        conv3d._STEM_IM2COL = flag
        lo, hi = make_chain(args.k), make_chain(2 * args.k)
        # new jit closures per flag => separate executables
        ts = {}
        for name, fn in (("lo", lo), ("hi", hi)):
            v = float(fn(np.float32(1.0)))
            assert np.isfinite(v)
            t0 = time.perf_counter()
            for i in range(args.iters):
                float(fn(np.float32(100 + i)))
            ts[name] = (time.perf_counter() - t0) / args.iters
        ms = (ts["hi"] - ts["lo"]) / args.k * 1e3
        name = "im2col" if flag else "xla-conv"
        print(f"[{name:8s}] stem unit {ms:7.2f} ms")


if __name__ == "__main__":
    main()
