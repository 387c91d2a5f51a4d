#!/usr/bin/env python
"""Attribute the canonical Stage-1 adversarial train step on the TPU.

Times each component of the fused G+D step (G forward, G fwd+bwd,
perceptual term, D forward, D fwd+bwd, full train_step) with the
two-point in-executable chain slope (tools/chain_probe.py docstring:
the only methodology that survives the tunnel's ~32 ms dispatch
overhead).  Output: a ms-per-component table to direct the next
kernel/layout work (e.g. is the PatchGAN worth a packed-native conv?).

Usage: python tools/train_attribution.py [--batch 1] [--k 3] [--iters 4]
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
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--k", type=int, default=3)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--small", action="store_true",
                   help="tiny geometry (CPU smoke)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    if args.small:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from gfe_mamba_tpu.losses.perceptual import PerceptualLoss
    from gfe_mamba_tpu.models.discriminator import PatchDiscriminator
    from gfe_mamba_tpu.models.unet3d import ResidualMidUNet3DViT
    from gfe_mamba_tpu.training.gan_trainer import GanTrainer

    if args.small:
        img = (16, 16, 8)
        gen = ResidualMidUNet3DViT(1, 1, is_segmentation=False,
                                   f_maps=(8, 16), fold_factor=2,
                                   vit_patch_size=4, vit_dim=32,
                                   vit_depth=1, vit_heads=2, vit_mlp_dim=32)
    else:
        img = (160, 160, 96)
        gen = ResidualMidUNet3DViT(1, 1, is_segmentation=False,
                                   f_maps=(64, 128, 256))
    disc = PatchDiscriminator(num_layers_d=3, num_channels=32)
    trainer = GanTrainer(gen, disc, PerceptualLoss(fake_3d_ratio=0.25,
                                                   seed=0),
                         mixed_precision="bf16", d_fresh_recon=True)

    B = args.batch
    key = jax.random.key(0)
    mri = jax.random.normal(key, (B,) + img + (1,), jnp.float32)
    pet = jax.random.normal(jax.random.fold_in(key, 1),
                            (B,) + img + (1,), jnp.float32)
    state = trainer.init_state(key, mri, pet)
    adv_on = jnp.float32(1.0)

    def timed(fn, *ops):
        vals = [float(fn(*ops, np.float32(i + 1))) for i in range(2)]
        t0 = time.perf_counter()
        vals = [fn(*ops, np.float32(100 + i)) for i in range(args.iters)]
        vals = [float(v) for v in vals]
        dt = (time.perf_counter() - t0) / args.iters
        assert all(np.isfinite(v) for v in vals)
        return dt

    def slope(make, *ops):
        # Params/state MUST be jit arguments, not closure captures:
        # closed-over device arrays embed as HLO constants and the axon
        # remote-compile helper uploads them inside the HLO (the 420 MB
        # ViT patchify weight stalls compilation 10+ min — PERF_NOTES
        # "Probe gotcha for posterity").
        k_lo, k_hi = 1, args.k
        t_lo = timed(make(k_lo), *ops, mri, pet)
        t_hi = timed(make(k_hi), *ops, mri, pet)
        return (t_hi - t_lo) / (k_hi - k_lo)

    rows = []

    def report(name, dt):
        rows.append((name, dt * 1e3))
        print(f"{name:28s} {dt*1e3:8.1f} ms", flush=True)

    # --- G forward (train mode, bf16 cast like the step) ---
    gp, dp = state.g_params, state.d_params

    def make_gfwd(kk):
        @jax.jit
        def fn(gp, mri, pet, s):
            y = mri
            for i in range(kk):
                r = trainer.generator.apply(
                    jax.tree_util.tree_map(
                        lambda a: a.astype(jnp.bfloat16)
                        if a.dtype == jnp.float32 else a, gp),
                    y.astype(jnp.bfloat16), train=True,
                    rngs={"dropout": jax.random.fold_in(key, i)})
                y = r.astype(jnp.float32) * 0.25 + mri * s
            return jnp.sum(y)
        return fn
    report("G fwd", slope(make_gfwd, gp))

    # --- G fwd+bwd (full generator loss incl. D fwd + perceptual) ---
    def make_gstep(kk):
        # chain via lax.scan, NOT a Python loop: an UNROLLED fwd+bwd
        # chain lets the TPU fusion emitter fuse the backward's
        # reversed-input conv across links and it crashes on the
        # resulting negative pad_low window (fusion_emitter.cc Check
        # failed: window.pad_low[i] == 0) — optimization_barrier on the
        # carries is NOT sufficient on-chip.  scan compiles the body
        # once, so there is nothing to fuse across.
        @jax.jit
        def fn(gp, dp, mri, pet, s):
            def body(carry, i):
                acc, y = carry

                def loss(p):
                    merged = {**gp, "params": p}
                    lg, _ = trainer._losses(merged, dp, y, pet, adv_on,
                                            jax.random.fold_in(key, i))
                    return lg
                l, g = jax.value_and_grad(loss)(gp["params"])
                # consume EVERY gradient leaf: reducing only one leaf
                # lets XLA dead-code-eliminate every other layer's dw
                # tower (round-5 probe bug -- the earlier chains
                # underestimated the backward by the whole dw cost)
                gsum = sum(jnp.sum(lf.astype(jnp.float32))
                           for lf in jax.tree_util.tree_leaves(g))
                # 1e-30 scale: rounds away in the f32 add (y stays
                # exactly mri) but is not an x*0 the simplifier could
                # fold, so the full gradient stays live
                return (acc + l, mri + gsum * s * 1e-30), None
            (acc, _), _ = jax.lax.scan(body, (0.0, mri), jnp.arange(kk))
            return acc * s
        return fn
    report("G loss fwd+bwd (w/ D fwd)", slope(make_gstep, gp, dp))

    # --- perceptual alone ---
    def make_perc(kk):
        @jax.jit
        def fn(mri, pet, s):
            acc = 0.0
            y = mri
            for i in range(kk):
                acc += trainer.perceptual_loss(y, pet)
                y = mri * (1.0 + acc * 0.0) + i * 0.0
            return acc * s
        return fn
    report("perceptual fwd", slope(make_perc))

    # --- D forward ---
    def make_dfwd(kk):
        @jax.jit
        def fn(dp, mri, pet, s):
            acc = 0.0
            y = pet
            for i in range(kk):
                acc += jnp.sum(trainer.discriminator.apply(dp, y)[-1]
                               .astype(jnp.float32))
                y = pet * (1.0 + acc * 0.0) + i * 0.0
            return acc * s
        return fn
    report("D fwd", slope(make_dfwd, dp))

    # --- D fwd+bwd (fake + real, the _d_loss shape) ---
    def make_dstep(kk):
        @jax.jit
        def fn(dp, mri, pet, s):
            acc = 0.0
            for i in range(kk):
                def loss(p, i=i):
                    merged = {**dp, "params": p}
                    return trainer._d_loss(merged, mri + i * 0.0, pet,
                                           adv_on)
                l, g = jax.value_and_grad(loss)(dp["params"])
                acc += l + sum(jnp.sum(lf.astype(jnp.float32))
                               for lf in jax.tree_util.tree_leaves(g)
                               ) * 1e-12
            return acc * s
        return fn
    report("D loss fwd+bwd (fake+real)", slope(make_dstep, dp))

    # --- full train_step (scan-chained) ---
    def make_full(kk):
        @jax.jit
        def fn(state, mri, pet, s):
            def body(st, i):
                st, logs = trainer.train_step.__wrapped__(
                    trainer, st, mri, pet, adv_on,
                    jax.random.fold_in(key, i))
                return st, logs["l1"]
            st, l1s = jax.lax.scan(body, state, jnp.arange(kk))
            return jnp.sum(l1s) * s
        return fn
    try:
        report("full train_step", slope(make_full, state))
    except Exception as e:  # scan-chaining a donated step can refuse
        print(f"full train_step chain failed ({type(e).__name__}); "
              f"falling back to repeated dispatch timing", flush=True)
        st = state
        for _ in range(2):
            st, _ = trainer.train_step(st, mri, pet, adv_on, key)
        t0 = time.perf_counter()
        n = args.iters
        for i in range(n):
            st, logs = trainer.train_step(st, mri, pet, adv_on,
                                          jax.random.fold_in(key, i))
        float(logs["l1"])
        report("full train_step (dispatch)", (time.perf_counter() - t0) / n)

    total = dict(rows)
    print("\nsummary (ms):", {k: round(v, 1) for k, v in total.items()},
          flush=True)


if __name__ == "__main__":
    main()
