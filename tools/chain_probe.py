#!/usr/bin/env python
"""Canonical TPU op probe (the ONLY valid methodology here).

In-executable chained op probe: defeats the ~32 ms fixed per-dispatch
overhead of the axon tunnel (measured: a tiny jnp.sum costs the same
32 ms/call as a 630 MB elementwise op, pipelined or not, device-resident
args or not) by repeating the op K times INSIDE one jit with a data
dependency, then reporting (T - overhead) / K.

Usage: python tools/chain_probe.py [--k 6] [--iters 6] [--only substr,..]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PEAK_TFLOPS = 197.0  # v5e bf16


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=6)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--only", type=str, default="")
    p.add_argument("--batch", type=int, default=2)
    args = p.parse_args()
    only = set(args.only.split(",")) if args.only else None
    K = args.k

    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    B = args.batch
    FULL = (B, 160, 160, 96, 64)
    results = []

    def timed(fn, x, pars):
        vals = [float(fn(pars, x, np.float32(i + 1))) for i in range(2)]
        t0 = time.perf_counter()
        vals = [fn(pars, x, np.float32(100 + i)) for i in range(args.iters)]
        vals = [float(v) for v in vals]
        dt = (time.perf_counter() - t0) / args.iters
        assert all(np.isfinite(v) for v in vals)
        assert len(set(vals)) == args.iters
        return dt

    # measure the dispatch overhead with a tiny executable
    @jax.jit
    def noop(pars, x, s):
        return jnp.sum(x) * s
    x0 = jax.device_put(jnp.arange(128, dtype=jnp.float32))
    overhead = timed(noop, x0, None)
    print(f"dispatch overhead: {overhead*1e3:.2f} ms", flush=True)

    def bench(name, module, in_shape, flops_per_op, chain=None, k=None):
        if only and not any(o in name for o in only):
            return
        k = k or K
        xin = jax.device_put(
            (jnp.arange(int(np.prod(in_shape)), dtype=jnp.float32) % 7 - 3)
            .astype(jnp.bfloat16).reshape(in_shape) * 0.1)
        pars = module.init(jax.random.key(0), xin)
        pars = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, pars)

        default_chain = lambda y, x: y[..., : x.shape[-1]] * 0.5 + x * 0.5 \
            if y.shape == x.shape else y
        chain_fn = chain or (lambda y, x: y)

        def make(kk):
            @jax.jit
            def fn(pars, x, s):
                y = x
                for _ in range(kk):
                    y = module.apply(pars, y)
                    y = chain_fn(y, x)
                return jnp.sum(y.astype(jnp.float32)) * s
            return fn
        del default_chain

        # two-point slope: constant dispatch overhead cancels
        k_lo, k_hi = max(1, k // 4), k
        t_lo = timed(make(k_lo), xin, pars)
        t_hi = timed(make(k_hi), xin, pars)
        dt = (t_hi - t_lo) / (k_hi - k_lo)
        tf = flops_per_op / dt / 1e12 if flops_per_op else 0.0
        print(f"{name:30s} {dt*1e3:8.2f} ms   {tf:6.1f} TF/s "
              f"{100*tf/PEAK_TFLOPS:5.1f}%", flush=True)
        results.append({"name": name, "ms": round(dt * 1e3, 2),
                        "tflops": round(tf, 1)})

    nvox = B * 160 * 160 * 96
    cflop = nvox * 27 * 64 * 64 * 2

    class Eltwise(nn.Module):
        op: str

        @nn.compact
        def __call__(self, x):
            if self.op == "elu":
                return jax.nn.elu(x)
            if self.op == "relu":
                return jax.nn.relu(x)
            if self.op == "add":
                return x + 1.0
            if self.op == "gn":
                return nn.GroupNorm(num_groups=8)(x)
            if self.op == "gn_relu":
                return jax.nn.relu(nn.GroupNorm(num_groups=8)(x))
            raise ValueError(self.op)

    bench("mul_add@full64", Eltwise("add"), FULL, 0,
          chain=lambda y, x: y * 0.999)
    bench("relu@full64", Eltwise("relu"), FULL, 0)
    bench("elu@full64", Eltwise("elu"), FULL, 0)
    bench("groupnorm@full64", Eltwise("gn"), FULL, 0)
    bench("gn_relu@full64", Eltwise("gn_relu"), FULL, 0)
    bench("conv64@full", nn.Conv(64, (3, 3, 3), padding=1), FULL, cflop)
    bench("conv64@full_nobias",
          nn.Conv(64, (3, 3, 3), padding=1, use_bias=False), FULL, cflop)

    class SingleGCR(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.GroupNorm(num_groups=8)(x)
            h = nn.Conv(64, (3, 3, 3), padding=1, use_bias=False)(h)
            return jax.nn.relu(h)

    bench("gn_conv_relu@full", SingleGCR(), FULL, cflop)

    from gfe_mamba_tpu.ops.blocks import ResNetBlock
    bench("resnetblock64@full(gcr)", ResNetBlock(64, order="gcr"), FULL,
          2 * cflop)

    # deconv cycle: down-strided conv then transposed conv back up
    class DeconvCycle(nn.Module):
        @nn.compact
        def __call__(self, x):  # x: (B,160,160,96,64)
            h = nn.Conv(128, (3, 3, 3), strides=(2, 2, 2), padding=1,
                        use_bias=False, name="down")(x)
            h = nn.ConvTranspose(64, (3, 3, 3), strides=(2, 2, 2),
                                 padding=[(1, 0)] * 3, use_bias=False,
                                 name="up")(h)
            return h

    hvox = B * 80 * 80 * 48
    bench("down+deconv_cycle", DeconvCycle(), FULL,
          hvox * 27 * 64 * 128 * 2 + nvox * 27 // 8 * 128 * 64 * 2)

    # transpose (fold) round trip
    class FoldCycle(nn.Module):
        @nn.compact
        def __call__(self, x):
            b, X, Y, Z, C = x.shape
            y = jnp.swapaxes(x, 1, 3) * 1.0
            return jnp.swapaxes(y, 1, 3) * 1.0

    bench("transpose_roundtrip@full", FoldCycle(), FULL, 0)

    # full generator chained PET->MRI
    from gfe_mamba_tpu.models.unet3d import ResidualMidUNet3DViT
    gen = ResidualMidUNet3DViT(1, 1, is_segmentation=False,
                               f_maps=(64, 128, 256))
    bench("generator@canonical", gen, (B, 160, 160, 96, 1),
          int(7.5e12 / 2 * B),
          chain=lambda y, x: jnp.tanh(y), k=3)

    with open("/tmp/chain_probe.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
