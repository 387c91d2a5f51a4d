#!/usr/bin/env python
"""Canonical-scale convergence run on TPU: 160x160x96 / dim-512 / depth-6.

Closes the scale-extrapolation gap left by tools/quality_parity.py,
which demonstrates torch-vs-jax quality parity only at 32x32x16 /
dim-64 / depth-2: this script trains the CANONICAL configuration
(configs/main_gan_vit_config.yaml + classify_mamba_config.yaml -- the
reference's published geometry, /root/reference/main_gan_vit.py:30,
classify_mamba.py:36-56) end to end on the TPU and reports the same
P/R/F1/Acc/MCC metric set, so there is direct evidence that the
full-size pipeline converges to the same quality the small-geometry
parity runs reach -- not just a decreasing loss curve.

TPU-native data path: the synthetic cohort is synthesized ON DEVICE
inside jit (per-subject volumes from `jax.random.fold_in` keys), so no
160^3 volume ever crosses the host<->device tunnel.  The same subject
index always yields the same volume, which also lets the tunnel's
(executable, args) memoization cache epoch-2+ synthesis for free.

The task mirrors tools/quality_parity.py:make_cohort scaled 5x in
(x, y) and 6x in z: converters get a dimmer frontal blob + enlarged
dark ventricle; PET is smooth(MRI) inverted; tabular cat0 carries the
label with 20% flips and num0 a shifted marker.

Usage:
    python tools/canonical_convergence.py --out CANONICAL_r03.json
    python tools/canonical_convergence.py --smoke   # tiny geometry, CPU-ok
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

from tools.quality_parity import metrics_from_preds  # noqa: E402

# canonical geometry (configs/main_gan_vit_config.yaml)
SHAPE = (160, 160, 96)
F_MAPS = (64, 128, 256)
DIM, DEPTH, HEADS, SEQ_LENGTH = 512, 6, 8, 4
ADV_WEIGHT, PERC_WEIGHT = 0.01, 0.001
LR_G, LR_D, LR_CLS = 1e-4, 5e-4, 1e-4


def tabular(seed: int, n: int, hard: bool = False):
    """Host-side labels + tabular columns (quality_parity cohort laws;
    --hard strips ALL tabular signal: cat0 a pure coin flip, num0 pure
    noise -- the classifier must read the imaging phenotype)."""
    rng = np.random.default_rng(seed)
    labels = np.concatenate([np.zeros(n // 2), np.ones(n - n // 2)])
    rng.shuffle(labels)
    flip_p = 0.5 if hard else 0.2
    num_scale = 0.0 if hard else 1.0
    flip = rng.random(n) < flip_p
    cat0 = np.where(flip, 1 - labels, labels).astype(np.int64)
    cat1 = rng.integers(0, 3, n)
    x_cat = np.stack([cat0, cat1], 1).astype(np.int64)
    num0 = num_scale * (2 * labels - 1) + rng.normal(0, 0.9, n)
    x_num = np.stack([num0] + [rng.normal(0, 1, n) for _ in range(3)],
                     1).astype(np.float32)
    return labels.astype(np.float32), x_cat, x_num


def make_synth(shape, seed: int, hard: bool = False):
    """Jitted on-device cohort synthesis: (idxs, labels) -> (mri, pet).

    --hard mirrors quality_parity.make_cohort's sub-ceiling knobs: the
    imaging contrast sits near the noise floor AND 15% of subjects
    express the OPPOSITE phenotype (irreducible label noise pinning
    Bayes accuracy at ~0.85), so converged metrics land mid-0.8s --
    regression-sensitive instead of saturated at 1.0 (VERDICT r3 #5).
    """
    import jax
    import jax.numpy as jnp

    img_gap = 0.10 if hard else 0.40     # bright-blob contrast
    vent_gap = 0.5 if hard else 2.0      # ventricle radius delta
    noise = 0.35 if hard else 0.16
    express_p = 0.15 if hard else 0.0    # P(opposite imaging phenotype)

    sx, sy, sz = (shape[0] / 32.0, shape[1] / 32.0, shape[2] / 16.0)
    xs = jnp.arange(shape[0], dtype=jnp.float32)[:, None, None]
    ys = jnp.arange(shape[1], dtype=jnp.float32)[None, :, None]
    zs = jnp.arange(shape[2], dtype=jnp.float32)[None, None, :]
    base = jax.random.key(7000 + seed)

    def blob(cx, cy, cz, r):
        return jnp.exp(-(((xs - cx * sx) ** 2 + (ys - cy * sy) ** 2
                          + (zs - cz * sz) ** 2) / (2.0 * (r * sx) ** 2)))

    def one(idx, label):
        key = jax.random.fold_in(base, idx)
        kn, ke = jax.random.split(key)
        eflip = (jax.random.uniform(ke, ()) < express_p) \
            .astype(jnp.float32)
        phen = eflip * (1.0 - label) + (1.0 - eflip) * label
        bright = 0.95 - img_gap * phen
        vent = 2.5 + vent_gap * phen
        vol = (0.30 * blob(10.0, 16.0, 8.0, 6.0)
               + bright * blob(22.0, 16.0, 8.0, 5.0)
               - 0.8 * blob(16.0, 10.0, 8.0, vent)
               + noise * jax.random.normal(kn, shape, jnp.float32))
        mri = jnp.clip(vol, -1.0, 1.0)
        pet = mri
        for ax in range(3):
            pet = (jnp.roll(pet, 1, ax) + 2 * pet
                   + jnp.roll(pet, -1, ax)) / 4
        pet = jnp.clip(1.0 - pet, -1.0, 1.0)
        return mri[..., None], pet[..., None]     # channels-last

    @jax.jit
    def synth(idxs, labels):
        return jax.vmap(one)(idxs, labels)

    return synth


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="CANONICAL_r03.json")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--n-train", type=int, default=96)
    parser.add_argument("--n-val", type=int, default=64,
                        help="held-out subjects for best-checkpoint "
                             "selection (classify_mamba's best-ckpt-by-"
                             "val semantics, SURVEY 2.2); 0 disables")
    parser.add_argument("--val-every", type=int, default=2)
    parser.add_argument("--n-test", type=int, default=192)
    parser.add_argument("--epochs1", type=int, default=10)
    parser.add_argument("--epochs2", type=int, default=25)
    parser.add_argument("--warm-epochs", type=int, default=3)
    parser.add_argument("--smoke", action="store_true",
                        help="tiny geometry + 1 epoch (CPU-runnable)")
    parser.add_argument("--hard", action="store_true",
                        help="sub-ceiling cohort (no tabular signal, "
                             "near-noise-floor contrast, 15%% opposite-"
                             "phenotype label noise): metrics land mid-"
                             "0.8s instead of saturating at 1.0")
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp

    from gfe_mamba_tpu.losses.perceptual import PerceptualLoss
    from gfe_mamba_tpu.models.discriminator import PatchDiscriminator
    from gfe_mamba_tpu.models.pipeline import build_gfe_mamba
    from gfe_mamba_tpu.models.unet3d import ResidualMidUNet3DViT
    from gfe_mamba_tpu.training.classify_trainer import ClassifyTrainer
    from gfe_mamba_tpu.training.gan_trainer import GanTrainer

    global SHAPE
    gen_kwargs = {}
    b1, b2 = 1, 2                    # canonical train_bc values
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        SHAPE = (32, 32, 16)
        gen_kwargs = dict(f_maps=(8, 16, 32), fold_factor=8,
                          vit_patch_size=4, vit_dim=64, vit_depth=2,
                          vit_heads=2, vit_mlp_dim=128)
        args.n_train, args.n_test = 8, 8
        args.n_val, args.val_every = 4, 1
        args.epochs1 = args.epochs2 = 1
        args.warm_epochs = 0
        cls_kwargs = dict(dim=64, depth=2, heads=4,
                          seq_length=SEQ_LENGTH, **gen_kwargs)
    else:
        gen_kwargs = dict(f_maps=F_MAPS)
        cls_kwargs = dict(dim=DIM, depth=DEPTH, heads=HEADS,
                          seq_length=SEQ_LENGTH, f_maps=F_MAPS)

    platform = jax.devices()[0].platform
    print(f"platform={platform} shape={SHAPE}", flush=True)

    n = args.n_train + args.n_val + args.n_test
    labels, x_cat, x_num = tabular(args.seed, n, hard=args.hard)
    synth = make_synth(SHAPE, args.seed, hard=args.hard)
    lab_dev = jnp.asarray(labels)
    rng_np = np.random.default_rng(1000 + args.seed)

    def batches(n_items, batch, offset=0):
        order = rng_np.permutation(n_items) + offset
        for i in range(0, n_items - batch + 1, batch):
            yield jnp.asarray(order[i:i + batch])

    report = {"config": {"shape": list(SHAPE), "f_maps": list(F_MAPS),
                         "dim": DIM, "depth": DEPTH, "heads": HEADS,
                         "seq_length": SEQ_LENGTH,
                         "n_train": args.n_train, "n_val": args.n_val,
                         "val_every": args.val_every,
                         "n_test": args.n_test,
                         "epochs1": args.epochs1, "epochs2": args.epochs2,
                         "warm_epochs": args.warm_epochs,
                         "batch1": b1, "batch2": b2,
                         "mixed_precision": "bf16",
                         "platform": platform, "seed": args.seed,
                         "hard": bool(args.hard)},
              "stage1_l1": [], "stage2_bce": []}

    # ---- Stage 1: full GAN game at canonical config ----
    generator = ResidualMidUNet3DViT(1, 1, is_segmentation=False,
                                     **gen_kwargs)
    disc = PatchDiscriminator(num_layers_d=3, num_channels=32)
    trainer1 = GanTrainer(generator, disc,
                          PerceptualLoss(fake_3d_ratio=0.25, seed=0),
                          lr_g=LR_G, lr_d=LR_D, adv_weight=ADV_WEIGHT,
                          perceptual_weight=PERC_WEIGHT,
                          mixed_precision="bf16")
    key = jax.random.key(args.seed)
    smri, spet = synth(jnp.arange(b1), lab_dev[:b1])
    state1 = trainer1.init_state(key, smri, spet)
    t0 = time.time()
    for epoch in range(args.epochs1):
        adv_on = jnp.float32(1.0 if epoch + 1 > args.warm_epochs else 0.0)
        losses = []
        for idx in batches(args.n_train, b1):
            key, sub = jax.random.split(key)
            mri, pet = synth(idx, lab_dev[idx])
            state1, logs = trainer1.train_step(state1, mri, pet,
                                               adv_on, sub)
            losses.append(float(logs["l1"]))
        report["stage1_l1"].append(round(float(np.mean(losses)), 5))
        print(f"stage1 epoch {epoch + 1}/{args.epochs1}: "
              f"l1={np.mean(losses):.4f} adv_on={float(adv_on)} "
              f"({time.time() - t0:.0f}s)", flush=True)
    report["stage1_seconds"] = round(time.time() - t0, 1)
    g_params = state1.g_params["params"]
    del state1

    # ---- Stage 2: frozen-generator classifier at canonical config ----
    model = build_gfe_mamba(categories=(2, 3), num_continuous=4,
                            **cls_kwargs)
    trainer2 = ClassifyTrainer(model, lr=LR_CLS, mixed_precision="bf16")
    key, sub = jax.random.split(key)
    smri, _ = synth(jnp.arange(b2), lab_dev[:b2])
    state2 = trainer2.init_state(sub, smri, jnp.asarray(x_cat[:b2]),
                                 jnp.asarray(x_num[:b2]),
                                 generator_params=g_params)
    def eval_range(params, start, count):
        """Predictions over subjects [start, start+count) (b2 batches)."""
        if count < b2:
            raise ValueError(
                f"eval_range needs at least one batch: count={count} < "
                f"batch2={b2} (raise --n-val/--n-test or lower --batch2)")
        if count % b2:
            print(f"eval_range: dropping {count % b2} trailing subjects "
                  f"(count={count} not divisible by batch2={b2})",
                  flush=True)
        preds = []
        for i in range(start, start + count - b2 + 1, b2):
            idx = jnp.arange(i, i + b2)
            mri, _ = synth(idx, lab_dev[idx])
            probs, _, _ = trainer2.eval_step(
                params, mri, jnp.asarray(x_cat[i:i + b2]),
                jnp.asarray(x_num[i:i + b2]),
                jnp.asarray(labels[i:i + b2]))
            preds.append(np.asarray(probs) >= 0.5)
        preds = np.concatenate(preds)
        return preds, labels[start:start + len(preds)]

    # best-checkpoint-by-val selection: the real Stage-2 pipeline keeps
    # a best ckpt by val metric (classify_mamba.py; reference
    # classify_mamba.py saves best_model.pth) -- a late-epoch memorized
    # model must not overwrite an earlier generalizing one here either.
    best = {"mcc": -2.0, "epoch": -1, "params": None}
    report["val_mcc"] = []
    t0 = time.time()
    for epoch in range(args.epochs2):
        losses = []
        for idx in batches(args.n_train, b2):
            key, sub = jax.random.split(key)
            hidx = np.asarray(idx)
            mri, _ = synth(idx, lab_dev[idx])
            state2, logs = trainer2.train_step(
                state2, mri, jnp.asarray(x_cat[hidx]),
                jnp.asarray(x_num[hidx]),
                jnp.asarray(labels[hidx]), sub)
            losses.append(float(logs["cla_loss"]))
        report["stage2_bce"].append(round(float(np.mean(losses)), 5))
        msg = (f"stage2 epoch {epoch + 1}/{args.epochs2}: "
               f"bce={np.mean(losses):.4f}")
        if args.n_val and ((epoch + 1) % args.val_every == 0
                           or epoch + 1 == args.epochs2):
            vp, vl = eval_range(state2.params, args.n_train, args.n_val)
            vmcc = metrics_from_preds(vp, vl)["mcc"]
            report["val_mcc"].append([epoch + 1, round(vmcc, 4)])
            msg += f" val_mcc={vmcc:+.3f}"
            if vmcc > best["mcc"]:
                best = {"mcc": vmcc, "epoch": epoch + 1,
                        "params": jax.device_get(state2.params)}
        print(f"{msg} ({time.time() - t0:.0f}s)", flush=True)
    report["stage2_seconds"] = round(time.time() - t0, 1)

    # ---- Eval on held-out subjects ----
    t0 = time.time()
    test_at = args.n_train + args.n_val
    preds, lab_eval = eval_range(state2.params, test_at, args.n_test)
    report["final_metrics"] = {
        k: round(v, 4) for k, v in
        metrics_from_preds(preds, lab_eval).items()}
    # 'metrics' keeps its legacy CANONICAL_r03-era meaning (last-epoch
    # test metrics); best-val-checkpoint results live under their own
    # key so artifacts stay comparable across rounds (schema 2).
    report["schema"] = 2
    report["metrics"] = dict(report["final_metrics"])
    if best["params"] is not None:
        preds, lab_eval = eval_range(
            jax.device_put(best["params"]), test_at, args.n_test)
        report["best_val_epoch"] = best["epoch"]
        report["best_ckpt_metrics"] = {
            k: round(v, 4) for k, v in
            metrics_from_preds(preds, lab_eval).items()}
    report["eval_seconds"] = round(time.time() - t0, 1)
    report["note"] = (
        "canonical-geometry two-stage training on device-synthesized "
        "cohort; metrics/final_metrics = last-epoch test metrics "
        "(legacy meaning), best_ckpt_metrics = test metrics of the "
        "best-val checkpoint (classify_mamba best-ckpt semantics); "
        "compare against the small-geometry QUALITY artifacts"
        + (" -- --hard pins Bayes accuracy ~0.85, so a quality "
           "regression moves these numbers instead of hiding under a "
           "1.0 ceiling" if args.hard else ""))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["metrics"]), flush=True)


if __name__ == "__main__":
    main()
