#!/usr/bin/env python
"""Per-segment attribution of the flagship generator forward (round 3).

Decomposes the canonical Residual_mid_UNet3D_vit forward into stages
(enc1 / enc2 / enc3 / ViT-fold / dec1 / dec2 / final) and times each
PREFIX of the stage chain with in-executable repetition (r=1 vs r=3
slope), so the ~32 ms tunnel dispatch overhead and the on-device RNG
cost cancel exactly.  Segment cost = t(prefix_k) - t(prefix_{k-1}).

The stage modules are the SAME factories UNet uses (ops/blocks.py
make_encoder_stack / make_decoder_stack), applied with the param
subtrees of one canonical UNet init, so the numbers are the real thing.

Usage: python tools/segment_probe.py [--batch 4] [--iters 6] [--micro]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--micro", action="store_true",
                   help="also time glue micro-ops (pad/pack, stats, "
                        "pool, deconv, fold)")
    p.add_argument("--r-hi", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from gfe_mamba_tpu.models.unet3d import (
        ResidualMidUNet3DViT, fold_3d_to_2d, unfold_2d_to_3d)
    from gfe_mamba_tpu.models.vit import ImageToImageViT
    from gfe_mamba_tpu.ops.blocks import (
        DotConv1x1, make_decoder_stack, make_encoder_stack)

    B = args.batch
    IMG = (160, 160, 96)
    F_MAPS = (64, 128, 256)

    model = ResidualMidUNet3DViT(1, 1, is_segmentation=False,
                                 f_maps=F_MAPS)
    # jit the init: eager init at canonical size is hundreds of
    # individual tunnel dispatches (~30 ms each) and can wedge
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1,) + IMG + (1,), jnp.bfloat16))
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)
    p_all = params["params"]

    from gfe_mamba_tpu.ops.pallas.conv3d import pack_z, unpack_z
    PACKED = True   # mirror the round-3 packed UNet flow
    encoders = make_encoder_stack(F_MAPS, "ResNetBlock", 3, 1, 2, 0.1,
                                  "gcr", 8, 2, 3, packed_io=PACKED)
    decoders = make_decoder_stack(F_MAPS, "ResNetBlock", 3, 1, "gcr", 8,
                                  "default", 0.1, 3, packed_io=PACKED)
    vit = ImageToImageViT(patch_size=40, dim=512, depth=4, heads=6,
                          mlp_dim=2048, dropout=0.1, emb_dropout=0.1)
    final = DotConv1x1(1, 3, packed_io=PACKED)

    # params must flow in as a jit ARGUMENT: closed-over device arrays
    # become jaxpr constants, and the axon remote-compile helper then
    # uploads them inside the HLO (the 420 MB ViT patchify weight stalls
    # it for 10+ minutes)
    def run_stages(pp, x, upto):
        sub = lambda name: {"params": pp[name]}
        if PACKED:
            x = pack_z(x)
        skips = []
        for i, enc in enumerate(encoders):
            if upto < i:
                return x, skips
            x = enc.apply(sub(f"encoder_{i}"), x)
            skips.insert(0, x)
        skips = skips[1:]
        if upto >= 3:
            xu = unpack_z(x) if PACKED else x
            mid_in = fold_3d_to_2d(xu, 8)
            mid_out = vit.apply(sub("mid"), mid_in, deterministic=True)
            x = unfold_2d_to_3d(mid_out, 8, w=xu.shape[3])
            if PACKED:
                x = pack_z(x)
        if upto >= 4:
            x = decoders[0].apply(sub("decoder_0"), skips[0], x,
                                  deterministic=True)
        if upto >= 5:
            x = decoders[1].apply(sub("decoder_1"), skips[1], x,
                                  deterministic=True)
        if upto >= 6:
            x = final.apply(sub("final_conv"), x)
        return x, skips

    def make_prefix(upto, r):
        @jax.jit
        def fn(pp, key):
            acc = jnp.float32(0.0)
            for i in range(r):
                k = jax.random.fold_in(key, i)
                x = jax.random.normal(k, (B,) + IMG + (1,), jnp.bfloat16)
                y, _ = run_stages(pp, x, upto)
                acc += jnp.sum(y.astype(jnp.float32))
            return acc
        return fn

    def timed(fn, iters):
        vals = [float(fn(p_all, jax.random.key(i))) for i in range(2)]
        t0 = time.perf_counter()
        outs = [fn(p_all, jax.random.key(100 + i)) for i in range(iters)]
        vals = [float(o) for o in outs]
        dt = (time.perf_counter() - t0) / iters
        assert all(np.isfinite(v) for v in vals)
        assert len(set(vals)) == iters
        return dt

    names = ["enc1", "enc2", "enc3", "vit_fold", "dec1", "dec2", "final"]
    # r=1 executables only (the r>=3 unrolled ViT prefix stalls the
    # remote-compile helper); the ~32 ms dispatch constant and the RNG
    # cost are IDENTICAL across prefixes, so segment differences are
    # exact.  First segment (enc1) still gets the r-slope for an
    # absolute anchor.
    prefix_ms = []
    results = []
    for upto in range(7):
        per = timed(make_prefix(upto, 1), args.iters) * 1e3
        prefix_ms.append(per)
        seg = prefix_ms[-1] - (prefix_ms[-2] if upto else 0.0)
        results.append({"stage": names[upto],
                        "prefix_ms": round(per, 1),
                        "segment_ms": round(seg, 1)})
        print(f"{names[upto]:10s} prefix {per:7.1f} ms   "
              f"segment {seg:7.1f} ms (incl +const for enc1)", flush=True)

    print(json.dumps({"batch": B, "segments": results}))

    if not args.micro:
        return

    # ---- glue micro-ops (same slope method) --------------------------
    from gfe_mamba_tpu.ops.pallas.conv3d import group_norm_stats
    from flax import linen as nn

    def micro(name, shape, op, r_hi=4):
        def make(r):
            @jax.jit
            def fn(params_dummy, key):
                acc = jnp.float32(0.0)
                for i in range(r):
                    k = jax.random.fold_in(key, i)
                    x = jax.random.normal(k, shape, jnp.bfloat16)
                    acc += jnp.sum(op(x).astype(jnp.float32))
                return acc
            return fn
        t_lo = timed(make(1), args.iters)
        t_hi = timed(make(r_hi), args.iters)
        per = (t_hi - t_lo) / (r_hi - 1) * 1e3
        print(f"micro {name:28s} {per:7.2f} ms", flush=True)

    full = (B, 160, 160, 96, 64)

    def padpack(x):
        # the fused kernel's producer pass: z-pack + affine + halo pad
        Bx, X, Y, Z, C = x.shape
        xv = x.reshape(Bx, X, Y, Z // 2, 2 * C)
        a2 = jnp.ones((Bx, 2 * C), x.dtype)
        xv = xv * a2[:, None, None, None, :] + a2[:, None, None, None, :]
        return jnp.pad(xv, ((0, 0), (1, 1), (1, 1), (1, 7), (0, 0)))

    micro("padpack_producer_full64", full, padpack)
    micro("gn_stats_full64", full,
          lambda x: group_norm_stats(x, 8)[0])
    micro("maxpool_full64", full,
          lambda x: nn.max_pool(x, (2, 2, 2), (2, 2, 2)))
    micro("sum_join_full64", full, lambda x: x + x * 0.5)
    micro("fold_unfold_enc3", (B, 40, 40, 24, 256),
          lambda x: unfold_2d_to_3d(fold_3d_to_2d(x, 8), 8, 24))

    dec_par = {"params": p_all["decoder_0"]["upsampling"]}
    deconv = nn.ConvTranspose(128, (3, 3, 3), strides=(2, 2, 2),
                              padding=[(1, 0)] * 3, use_bias=False)
    micro("deconv_256to128_40cube", (B, 40, 40, 24, 256),
          lambda x: deconv.apply(dec_par, x))


if __name__ == "__main__":
    main()
