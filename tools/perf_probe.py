#!/usr/bin/env python
"""Stage-level perf probe for the Stage-1 generator on the TPU.

Times each piece of the canonical (160,160,96) f_maps=(64,128,256)
generator in isolation (fresh on-device inputs per call, pipelined
dispatch, host value fetch inside the timed region -- see bench.py for
why, the axon tunnel memoizes and resolves block_until_ready early),
reports ms + achieved TFLOP/s + % of the v5e bf16 peak, and A/B-tests
candidate optimizations (x-packed C=64 conv, pixel-shuffle deconv).

Usage:  python tools/perf_probe.py [--iters 8] [--only enc1,conv64,...]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PEAK_TFLOPS = 197.0  # v5e bf16


def measure(fn, params, keys):
    outs = [fn(params, k) for k in keys]
    vals = [float(o) for o in outs]
    assert all(np.isfinite(v) for v in vals)
    return vals


def timeit(fn, params, iters):
    import jax
    float(fn(params, jax.random.key(0)))          # compile
    measure(fn, params, [jax.random.key(10 + i) for i in range(2)])  # warm
    t0 = time.perf_counter()
    measure(fn, params, [jax.random.key(100 + i) for i in range(iters)])
    dt = (time.perf_counter() - t0) / iters
    return dt


def report(name, dt, flops):
    tf = flops / dt / 1e12 if flops else 0.0
    pct = 100 * tf / PEAK_TFLOPS
    print(f"{name:28s} {dt * 1e3:9.2f} ms   {tf:7.1f} TF/s  {pct:5.1f}%",
          flush=True)
    return {"name": name, "ms": round(dt * 1e3, 2),
            "tflops": round(tf, 1), "pct_peak": round(pct, 1)}


def conv_flops(voxels, cin, cout, k=27, batch=2):
    return batch * voxels * k * cin * cout * 2


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--only", type=str, default="")
    args = p.parse_args()
    only = set(args.only.split(",")) if args.only else None

    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from gfe_mamba_tpu.ops.blocks import Decoder, Encoder
    from gfe_mamba_tpu.models.unet3d import ResidualMidUNet3DViT, fold_3d_to_2d
    from gfe_mamba_tpu.models.vit import ImageToImageViT

    B = args.batch
    FULL = (160, 160, 96)
    HALF = (80, 80, 48)
    QUART = (40, 40, 24)
    nvox = lambda s: s[0] * s[1] * s[2]
    results = []

    def bench_module(name, mod, in_shape, flops, method=None):
        if only and not any(o in name for o in only):
            return
        x0 = jnp.zeros((B,) + in_shape, jnp.bfloat16)
        params = mod.init(jax.random.key(0), x0) if method is None else \
            mod.init(jax.random.key(0), x0, method=method)
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, params)

        @jax.jit
        def fn(params, key):
            x = jax.random.normal(key, (B,) + in_shape, jnp.bfloat16)
            y = mod.apply(params, x) if method is None else \
                mod.apply(params, x, method=method)
            return jnp.sum(y.astype(jnp.float32))

        dt = timeit(fn, params, args.iters)
        results.append(report(name, dt, flops))

    # ---- in-context stage blocks (ResNetBlock order 'gcr' like flagship)
    fl = conv_flops
    bench_module("enc1(64@full)",
                 Encoder(64, basic_module="ResNetBlock", apply_pooling=False,
                         order="gcr"),
                 FULL + (1,), 2 * fl(nvox(FULL), 64, 64, 27, B))
    bench_module("enc2(128@half)",
                 Encoder(128, basic_module="ResNetBlock", order="gcr"),
                 FULL + (64,),
                 2 * fl(nvox(HALF), 128, 128, 27, B)
                 + fl(nvox(HALF), 64, 128, 1, B))
    bench_module("enc3(256@quart)",
                 Encoder(256, basic_module="ResNetBlock", order="gcr"),
                 HALF + (128,),
                 2 * fl(nvox(QUART), 256, 256, 27, B)
                 + fl(nvox(QUART), 128, 256, 1, B))

    # decoders need two inputs; wrap in a tiny module
    class DecWrap(nn.Module):
        out_channels: int
        skip_shape: tuple

        @nn.compact
        def __call__(self, x):
            skip = jnp.ones((x.shape[0],) + self.skip_shape, x.dtype)
            return Decoder(self.out_channels, basic_module="ResNetBlock",
                           order="gcr", name="dec")(skip, x)

    bench_module("dec0(256->128@half)", DecWrap(128, HALF + (128,)),
                 QUART + (256,),
                 2 * fl(nvox(HALF), 128, 128, 27, B)
                 + fl(nvox(HALF), 256, 128, 27 // 8, B))
    bench_module("dec1(128->64@full)", DecWrap(64, FULL + (64,)),
                 HALF + (128,),
                 2 * fl(nvox(FULL), 64, 64, 27, B)
                 + fl(nvox(FULL), 128, 64, 27 // 8, B))

    # ViT mid: fold (B,40,40,24,256) -> (B,320,120,256)
    class VitWrap(nn.Module):
        @nn.compact
        def __call__(self, x):
            m = fold_3d_to_2d(x, 8)
            return ImageToImageViT(patch_size=40, dim=512, depth=4, heads=6,
                                   mlp_dim=2048, name="mid")(m)

    bench_module("vit_mid", VitWrap(), QUART + (256,), 0)

    # ---- microbenches
    bench_module("conv64_full(x2)",
                 nn.Sequential([nn.Conv(64, (3, 3, 3), padding=1),
                                nn.Conv(64, (3, 3, 3), padding=1)]),
                 FULL + (64,), 2 * fl(nvox(FULL), 64, 64, 27, B))
    bench_module("conv128_half(x2)",
                 nn.Sequential([nn.Conv(128, (3, 3, 3), padding=1),
                                nn.Conv(128, (3, 3, 3), padding=1)]),
                 HALF + (128,), 2 * fl(nvox(HALF), 128, 128, 27, B))
    bench_module("deconv128to64",
                 nn.ConvTranspose(64, (3, 3, 3), strides=(2, 2, 2),
                                  padding=[(1, 0)] * 3, use_bias=False),
                 HALF + (128,), fl(nvox(FULL), 128, 64, 27 // 8, B))
    bench_module("groupnorm64_full", nn.GroupNorm(num_groups=8),
                 FULL + (64,), 0)

    # ---- candidate: x-packed C=64 conv (2 fine x positions -> lanes)
    class PackedConv64(nn.Module):
        """3^3 conv, C=64, computed with x packed by 2 into channels.

        Math-identical to nn.Conv(64, (3,3,3), padding=1) on the fine
        grid: fine x = 2*px + o, packed channels indexed (c, o) as
        c*2+o; the packed kernel is (2,3,3) in (px, y, z) covering fine
        offsets {-1..2} with per-offset zero structure.
        """

        features: int = 64

        @nn.compact
        def __call__(self, x):  # x: (B, X, Y, Z, C) fine grid, X even
            Bx, X, Y, Z, C = x.shape
            F = self.features
            w = self.param("kernel", nn.initializers.lecun_normal(),
                           (3, 3, 3, C, F), jnp.bfloat16)
            # pack: (B, X/2, Y, Z, 2C), channel index c*2+o
            xp = x.reshape(Bx, X // 2, 2, Y, Z, C)
            xp = jnp.moveaxis(xp, 2, -2).reshape(Bx, X // 2, Y, Z, 2 * C)
            # packed kernel (3,3,3) over packed x, in 2C, out 2F
            wp = jnp.zeros((3, 3, 3, 2 * C, 2 * F), w.dtype)
            # out offset oo at fine 2*px+oo uses fine taps 2*px+oo+d,
            # d in {-1,0,1}: fine index = 2*(px+q)+oi with q = (oo+d)//2
            # (floor), oi = (oo+d) % 2 -> packed kernel tap kx = q+1
            for oo in range(2):
                for d in (-1, 0, 1):
                    q, oi = divmod(oo + d, 2)
                    wp = wp.at[q + 1, :, :, oi::2, oo::2].set(
                        w[d + 1].reshape(3, 3, C, F))
            y = jax.lax.conv_general_dilated(
                xp, wp, window_strides=(1, 1, 1),
                padding=[(1, 1)] * 3,
                dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))
            # unpack
            y = y.reshape(Bx, X // 2, Y, Z, F, 2)
            y = jnp.moveaxis(y, -1, 2).reshape(Bx, X, Y, Z, F)
            return y

    bench_module("packedconv64_full(x2)",
                 nn.Sequential([PackedConv64(), PackedConv64()]),
                 FULL + (64,), 2 * fl(nvox(FULL), 64, 64, 27, B))

    # ---- candidate: pixel-shuffle deconv (depth-to-space decomposition)
    class ShuffleDeconv(nn.Module):
        """k=3 s=2 transposed conv as a dense 2^3 conv to 8*F channels
        + depth-to-space; mathematically a superset (dense sub-kernels).
        FLOP-inflated 2.37x but MXU-dense."""

        features: int = 64

        @nn.compact
        def __call__(self, x):
            Bx, X, Y, Z, C = x.shape
            F = self.features
            y = nn.Conv(8 * F, (2, 2, 2), padding=1, use_bias=False,
                        name="conv")(x)          # (B, X+1, Y+1, Z+1, 8F)
            y = y[:, 1:, 1:, 1:]
            y = y.reshape(Bx, X, Y, Z, 2, 2, 2, F)
            y = jnp.einsum("bxyzijkf->bxiyjzkf", y)
            return y.reshape(Bx, 2 * X, 2 * Y, 2 * Z, F)

    bench_module("shuffledeconv128to64", ShuffleDeconv(64),
                 HALF + (128,), fl(nvox(FULL), 128, 64, 27 // 8, B))

    # ---- full generator for reference
    gen = ResidualMidUNet3DViT(1, 1, is_segmentation=False,
                               f_maps=(64, 128, 256))
    bench_module("generator_full", gen, FULL + (1,), int(7.5e12 / 2 * B))

    with open("/tmp/perf_probe.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
