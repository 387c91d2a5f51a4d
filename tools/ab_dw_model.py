#!/usr/bin/env python
"""Bisect the dw-path win between unit level and the full Stage-1 loss.

tools/ab_dw_unit.py shows 14 ms/layer saved by the Pallas dw kernel in
a single-unit value_and_grad; tools/train_attribution.py shows only
~2 ms on the full G loss.  This probe chains value_and_grad of the
BARE generator (sum-of-output loss, no D / perceptual / optimizer)
with the gate on vs off, at canonical geometry, bf16 params like the
trainer's cast.

Usage: python tools/ab_dw_model.py [--k 4] [--iters 6] [--enc-only]
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
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--iters", type=int, default=6)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from gfe_mamba_tpu.ops.pallas import conv3d as c3
    from gfe_mamba_tpu.models.unet3d import ResidualMidUNet3DViT

    gen = ResidualMidUNet3DViT(1, 1, is_segmentation=False,
                               f_maps=(64, 128, 256))
    x = jax.device_put(
        (jnp.arange(1 * 160 * 160 * 96, dtype=jnp.float32) % 7 - 3)
        .astype(jnp.bfloat16).reshape(1, 160, 160, 96, 1) * 0.1)
    # eval_shape init (no compute), then fill with small random values
    shapes = jax.eval_shape(gen.init, jax.random.key(0),
                            jnp.zeros(x.shape, jnp.bfloat16))
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    rngs = jax.random.split(jax.random.key(1), len(leaves))
    params = jax.tree_util.tree_unflatten(treedef, [
        (jax.random.normal(r, s.shape, jnp.bfloat16) * 0.02)
        if jnp.issubdtype(s.dtype, jnp.floating)
        else jnp.zeros(s.shape, s.dtype)
        for r, s in zip(rngs, leaves)])

    def timed(fn, *ops):
        vals = [float(fn(*ops, np.float32(i + 1))) for i in range(2)]
        t0 = time.perf_counter()
        vals = [fn(*ops, np.float32(100 + i)) for i in range(args.iters)]
        vals = [float(v) for v in vals]
        dt = (time.perf_counter() - t0) / args.iters
        assert all(np.isfinite(v) for v in vals)
        return dt

    for use_pallas in (True, False):
        c3._DW_PALLAS = use_pallas

        def make(kk):
            @jax.jit
            def fn(params, x, s):
                def body(acc, i):
                    def loss(p):
                        y = gen.apply(p, x * (1 + (acc + i) * 1e-12)
                                      .astype(x.dtype))
                        return jnp.mean(jnp.abs(y.astype(jnp.float32)))
                    l, g = jax.value_and_grad(loss)(params)
                    # consume EVERY gradient leaf: reducing only one
                    # leaf lets XLA dead-code-eliminate all the other
                    # layers' dw towers (the round-5 probe bug -- every
                    # earlier chain underestimated the backward)
                    gsum = sum(jnp.sum(leaf.astype(jnp.float32))
                               for leaf in jax.tree_util.tree_leaves(g))
                    return acc + l + gsum * 1e-12, None
                acc, _ = jax.lax.scan(body, s.astype(jnp.float32),
                                      jnp.arange(kk))
                return acc
            return fn

        k_lo, k_hi = 1, args.k
        t_lo = timed(make(k_lo), params, x)
        t_hi = timed(make(k_hi), params, x)
        dt = (t_hi - t_lo) / (k_hi - k_lo)
        print(f"bare-G fwd+bwd  pallas_dw={use_pallas!s:5s} "
              f"{dt*1e3:8.2f} ms/link", flush=True)


if __name__ == "__main__":
    main()
