#!/usr/bin/env python
"""A/B the PatchGAN space-to-depth conv lowering in the Stage-1 step.

Times the canonical fused G+D adversarial train step (the loop the
reference distributes, /root/reference/main_gan_vit.py:54-56) with
``PatchDiscriminator(s2d=False)`` vs ``s2d=True`` (ops/conv4.py), and
the isolated D fwd+bwd component, using the two-point in-executable
chain slope (tools/chain_probe.py docstring -- the only methodology
that survives the tunnel's ~32 ms dispatch overhead).  The param tree
is identical on both sides, so one init serves both.

Usage: python tools/ab_s2d_disc.py [--batch 1] [--k 3] [--iters 4]
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

    import optax

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
                                   f_maps=(64, 128, 256), remat=False)

    B = args.batch
    key = jax.random.key(0)
    zeros = jnp.zeros((B,) + img + (1,), jnp.float32)

    def build(s2d):
        disc = PatchDiscriminator(num_layers_d=3, num_channels=32, s2d=s2d)
        return disc, GanTrainer(gen, disc,
                                PerceptualLoss(fake_3d_ratio=0.25),
                                mixed_precision="bf16", d_fresh_recon=True)

    disc_a, tr_a = build(False)
    disc_b, tr_b = build(True)
    state = tr_a.init_state(key, zeros, zeros)  # identical tree both sides

    def slope(make, iters):
        """ms/unit from the k vs 2k in-executable chain difference."""
        lo, hi = make(args.k), make(2 * args.k)
        ts = {}
        for name, fn in (("lo", lo), ("hi", hi)):
            fn(np.float32(1.0))  # compile + warm
            t0 = time.perf_counter()
            for i in range(iters):
                v = float(fn(np.float32(100 + i)))
                assert np.isfinite(v), v
            ts[name] = (time.perf_counter() - t0) / iters
        return (ts["hi"] - ts["lo"]) / args.k * 1e3

    # State/params MUST be jit arguments, not closure captures: closed-over
    # device arrays embed as HLO constants and the axon remote-compile
    # helper uploads them inside the HLO (PERF_NOTES "Probe gotcha").
    def make_step(trainer):
        def make(kk):
            @jax.jit
            def fn(st0, salt):
                def body(carry, i):
                    st, r = carry
                    r, r1, r2, r3 = jax.random.split(r, 4)
                    mri = jax.random.normal(r1, zeros.shape, jnp.float32)
                    pet = jax.random.normal(r2, zeros.shape, jnp.float32)
                    st, logs = trainer.train_step(st, mri, pet,
                                                  jnp.float32(1.0), r3)
                    return (st, r), logs["g_loss"]
                k0 = jax.random.fold_in(jax.random.key(1), salt.astype(jnp.int32))
                (_, _), losses = jax.lax.scan(
                    body, (st0, k0), jnp.arange(kk))
                return losses[-1]
            return lambda s: fn(state, jnp.float32(s))
        return make

    def make_dstep(disc):
        def make(kk):
            @jax.jit
            def fn(d_params, salt):
                k0 = jax.random.fold_in(jax.random.key(2),
                                        salt.astype(jnp.int32))

                def body(carry, i):
                    p, r = carry
                    r, r1 = jax.random.split(r)
                    x = jax.random.normal(r1, zeros.shape, jnp.float32)

                    def loss(pp):
                        outs = disc.apply(pp, x.astype(jnp.bfloat16))
                        return sum(jnp.mean(o.astype(jnp.float32) ** 2)
                                   for o in outs)
                    l, g = jax.value_and_grad(loss)(p)
                    p = jax.tree_util.tree_map(
                        lambda a, b: a - 1e-9 * b, p, g)
                    return (p, r), l
                (_, _), ls = jax.lax.scan(body, (d_params, k0),
                                          jnp.arange(kk))
                return ls[-1]
            return lambda s: fn(state.d_params, jnp.float32(s))
        return make

    print(f"platform={jax.devices()[0].platform} img={img} batch={B}")
    results = {}
    for name, trainer, disc in (("xla", tr_a, disc_a), ("s2d", tr_b, disc_b)):
        dms = slope(make_dstep(disc), args.iters)
        print(f"[{name}] D fwd+bwd      {dms:8.1f} ms/step")
        results[f"{name}_d_ms"] = dms
        ms = slope(make_step(trainer), args.iters)
        print(f"[{name}] full train step {ms:8.1f} ms/step "
              f"({B / ms * 1e3:.2f} vol/s)")
        results[f"{name}_step_ms"] = ms
    if "xla_step_ms" in results and "s2d_step_ms" in results:
        d = results["xla_step_ms"] - results["s2d_step_ms"]
        print(f"s2d wins by {d:+.1f} ms/step "
              f"({d / results['xla_step_ms'] * 100:+.1f}%)")


if __name__ == "__main__":
    main()
