#!/usr/bin/env python
"""Quality-parity benchmark: torch reference vs gfe_mamba_tpu.

Trains BOTH implementations end-to-end (Stage-1 MRI->PET generator,
then Stage-2 frozen-generator Mamba classifier) on an identical
deterministic synthetic cohort and reports Precision/Recall/F1/
Accuracy/MCC side by side (the reference's published metric set,
/root/reference/README.md:18, eval loop /root/reference/test_mamba.py:
69-105).  North star: F1/MCC within 0.5 pt (BASELINE.md).

Methodology notes (fairness):
* Identical cohort, identical train/test split, identical batch sizes,
  epochs, optimizers (Adam 1e-4, clip 1.0) and eval threshold (0.5).
* Stage-1 trains with L1 only on BOTH sides: the reference's perceptual
  loss needs MONAI+pretrained SqueezeNet (not installable here) and the
  adversarial term is gated off for an apples-to-apples comparison.
* The torch reference hardcodes the canonical 160x160x96 geometry in
  three places; the harness re-instantiates those layers for the small
  cohort geometry (documented below at the patch sites).  The JAX side
  is parameterized, so no surgery is needed there.
* Parameter initializations are each framework's native ones -- the
  comparison is of converged quality, not of bit-level trajectories.

Usage:
    python tools/quality_parity.py --out QUALITY_r02.json
    python tools/quality_parity.py --smoke      # tiny run for tests
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# cohort geometry (small enough for 1-core CPU torch training)
SHAPE = (32, 32, 16)
F_MAPS = (8, 16, 32)
DIM = 64            # classifier token dim (reference: 512)
DEPTH = 2           # mamba layers (reference: 6)
HEADS = 4
SEQ_LENGTH = 4
VIT = dict(dim=64, depth=2, heads=2, mlp_dim=128)
MID_HW = 64 * 4     # depth-folded bottleneck 2D map (8,8,4) -> (64, 4)
D_CROSS = SHAPE[0] * SHAPE[1]


# ---------------------------------------------------------------------------
# cohort

HARD = False


def make_cohort(seed: int, n_train: int = 128, n_test: int = 192):
    """Multimodal synthetic cohort with a learnable conversion signal.

    label=1 ("converter") subjects get (a) a dimmer frontal blob and an
    enlarged dark ventricle in the MRI, (b) a shifted numeric marker,
    (c) a noisy categorical marker.  PET is a deterministic transform
    of the MRI (smooth + invert), so Stage-1 is learnable and the
    generated PET carries the image signal into Stage-2.
    """
    rng = np.random.default_rng(seed)
    n = n_train + n_test
    labels = np.concatenate([np.zeros(n // 2), np.ones(n - n // 2)])
    rng.shuffle(labels)
    x, y, z = np.meshgrid(*[np.arange(s) for s in SHAPE], indexing="ij")
    # --hard: the tabular columns carry NO signal (cat0 pure coin flip,
    # num0 pure noise) and the image contrast sits near the noise floor
    # -- the classifier must extract everything through the generator's
    # imaging features, and converged quality lands below the ceiling
    img_gap = 0.10 if HARD else 0.40     # bright-blob contrast
    vent_gap = 0.5 if HARD else 2.0      # ventricle radius delta
    noise = 0.35 if HARD else 0.16
    flip_p = 0.5 if HARD else 0.2
    num_scale = 0.0 if HARD else 1.0

    def blob(cx, cy, cz, r):
        return np.exp(-(((x - cx) ** 2 + (y - cy) ** 2
                         + (z - cz) ** 2) / (2 * r ** 2)))

    mris, pets = [], []
    for lab in labels:
        bright = (0.95 - img_gap) if lab else 0.95   # "atrophy" signal
        vent = (2.5 + vent_gap) if lab else 2.5      # ventricle radius
        vol = (0.30 * blob(10, 16, 8, 6)
               + bright * blob(22, 16, 8, 5)
               - 0.8 * blob(16, 10, 8, vent)
               + rng.normal(0, noise, SHAPE))
        mri = np.clip(vol, -1, 1).astype(np.float32)
        # deterministic MRI->PET: separable 1-2-1 smoothing + inversion
        pet = mri
        for ax in range(3):
            pet = (np.roll(pet, 1, ax) + 2 * pet + np.roll(pet, -1, ax)) / 4
        pet = np.clip(1.0 - pet, -1, 1).astype(np.float32)
        mris.append(mri)
        pets.append(pet)
    mri = np.stack(mris)
    pet = np.stack(pets)

    # tabular: cat0 = label w/ 20% flips, cat1 noise; num0 = signal
    flip = rng.random(n) < flip_p
    cat0 = np.where(flip, 1 - labels, labels).astype(np.int64)
    cat1 = rng.integers(0, 3, n)
    x_cat = np.stack([cat0, cat1], 1).astype(np.int64)
    num0 = num_scale * (2 * labels - 1) + rng.normal(0, 0.9, n)
    x_num = np.stack([num0] + [rng.normal(0, 1, n) for _ in range(3)],
                     1).astype(np.float32)

    sl_tr, sl_te = slice(0, n_train), slice(n_train, n)
    return {
        "categories": (2, 3), "num_continuous": 4,
        "train": dict(mri=mri[sl_tr], pet=pet[sl_tr], y=labels[sl_tr],
                      x_cat=x_cat[sl_tr], x_num=x_num[sl_tr]),
        "test": dict(mri=mri[sl_te], pet=pet[sl_te], y=labels[sl_te],
                     x_cat=x_cat[sl_te], x_num=x_num[sl_te]),
    }


def metrics_from_preds(preds: np.ndarray, y: np.ndarray) -> dict:
    """P/R/F1/Acc/MCC from hard predictions (test_mamba.py:69-105
    metric set, with the intended (preds, targets) argument order)."""
    preds = preds.astype(bool)
    y = y.astype(bool)
    tp = int(np.sum(preds & y))
    tn = int(np.sum(~preds & ~y))
    fp = int(np.sum(preds & ~y))
    fn = int(np.sum(~preds & y))
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    acc = (tp + tn) / max(tp + tn + fp + fn, 1)
    den = math.sqrt(float((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)))
    mcc = ((tp * tn - fp * fn) / den) if den else 0.0
    return {"precision": prec, "recall": rec, "f1": f1,
            "accuracy": acc, "mcc": mcc}


def _epoch_batches(rng: np.random.Generator, n: int, batch: int):
    order = rng.permutation(n)
    for i in range(0, n - batch + 1, batch):
        yield order[i:i + batch]


# ---------------------------------------------------------------------------
# torch reference side

def run_torch(cohort, seed: int, epochs1: int, epochs2: int,
              batch: int = 8, verbose: bool = False) -> dict:
    import torch
    for mod in ("torchvision", "torchvision.transforms"):
        sys.modules.setdefault(mod, types.ModuleType(mod))
    sys.modules["torchvision"].transforms = sys.modules[
        "torchvision.transforms"]
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from pytorch3dunet.unet3d.model import Residual_mid_UNet3D_vit
    from vit_pytorch_diy import ViT
    from classify.classifier import Combine_classfier_vit_mid
    from cross_atten.mamba_transformer import Cross_mamba_both
    from cross_atten.sd_cross_atten import CrossAttention

    torch.manual_seed(seed)
    rng = np.random.default_rng(1000 + seed)
    tr, te = cohort["train"], cohort["test"]

    gen = Residual_mid_UNet3D_vit(1, 1, is_segmentation=False,
                                  f_maps=F_MAPS)
    # the reference hardcodes the canonical ViT geometry (model.py:
    # 107-117); re-instantiate for the (64, 4) folded bottleneck
    gen.mid = ViT(image_size=(MID_HW // 4, 4), patch_size=4,
                  dim=VIT["dim"], depth=VIT["depth"], heads=VIT["heads"],
                  mlp_dim=VIT["mlp_dim"], dropout=0.1, emb_dropout=0.1,
                  channels=F_MAPS[-1])

    def to_t(a):
        return torch.from_numpy(np.ascontiguousarray(a))

    # ---- Stage 1: L1-only generator training (main_gan_vit.py:70-82,
    # adversarial+perceptual gated off on both sides) ----
    opt_g = torch.optim.Adam(gen.parameters(), lr=1e-4)
    gen.train()
    for epoch in range(epochs1):
        losses = []
        for idx in _epoch_batches(rng, len(tr["mri"]), batch):
            mri = to_t(tr["mri"][idx])[:, None]
            pet = to_t(tr["pet"][idx])[:, None]
            recon = gen(mri)
            loss = torch.nn.functional.l1_loss(recon, pet)
            opt_g.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(gen.parameters(), 1.0)
            opt_g.step()
            losses.append(float(loss.detach()))
        if verbose:
            print(f"[torch] stage1 epoch {epoch + 1}: "
                  f"l1={np.mean(losses):.4f}", flush=True)
    gen.eval()

    # ---- Stage 2 (classify_mamba.py:36-117) ----
    ft = Cross_mamba_both(categories=cohort["categories"],
                          num_continuous=cohort["num_continuous"],
                          dim=DIM, depth=DEPTH, heads=HEADS,
                          dim_head=DIM // HEADS, dim_out=1,
                          attn_dropout=0.1, ff_dropout=0.1)
    # canonical-geometry layers (mamba_transformer.py:84 d_cross=160*160,
    # classifier.py:327 Linear(320*120, seq)); re-instantiate for 32^3
    ft.final_cross = CrossAttention(n_heads=HEADS, d_embed=DIM,
                                    d_cross=D_CROSS)
    comb = Combine_classfier_vit_mid(seq_length=SEQ_LENGTH)
    comb.vit_mid_linear = torch.nn.Linear(MID_HW, SEQ_LENGTH)

    params = list(comb.parameters()) + list(ft.parameters())
    opt = torch.optim.Adam(params, lr=1e-4)
    bce = torch.nn.BCELoss()
    ft.train(), comb.train()
    for epoch in range(epochs2):
        losses = []
        for idx in _epoch_batches(rng, len(tr["mri"]), batch):
            mri = to_t(tr["mri"][idx])[:, None]
            y = to_t(tr["y"][idx].astype(np.float32))
            with torch.no_grad():
                mid_in, mid_out, pet = gen(mri, output_vit_mid=True)
            feat = comb(mid_in, mid_out)
            logits = ft(to_t(tr["x_cat"][idx]), to_t(tr["x_num"][idx]),
                        feat, [mri, pet])
            loss = bce(torch.sigmoid(logits.squeeze(-1)), y)
            opt.zero_grad()
            loss.backward()
            for p in params:
                torch.nn.utils.clip_grad_norm_(p, 1.0)
            opt.step()
            losses.append(float(loss.detach()))
        if verbose:
            print(f"[torch] stage2 epoch {epoch + 1}: "
                  f"bce={np.mean(losses):.4f}", flush=True)

    ft.eval(), comb.eval()
    preds = []
    with torch.no_grad():
        for i in range(0, len(te["mri"]), batch):
            sl = slice(i, i + batch)
            mri = to_t(te["mri"][sl])[:, None]
            mid_in, mid_out, pet = gen(mri, output_vit_mid=True)
            feat = comb(mid_in, mid_out)
            logits = ft(to_t(te["x_cat"][sl]), to_t(te["x_num"][sl]),
                        feat, [mri, pet])
            preds.append(torch.sigmoid(logits.squeeze(-1)).numpy() >= 0.5)
    return metrics_from_preds(np.concatenate(preds), te["y"])


# ---------------------------------------------------------------------------
# gfe_mamba_tpu side

def run_jax(cohort, seed: int, epochs1: int, epochs2: int,
            batch: int = 8, verbose: bool = False) -> dict:
    import jax
    import jax.numpy as jnp
    from gfe_mamba_tpu.losses.perceptual import PerceptualLoss
    from gfe_mamba_tpu.models.discriminator import PatchDiscriminator
    from gfe_mamba_tpu.models.pipeline import build_gfe_mamba
    from gfe_mamba_tpu.models.unet3d import ResidualMidUNet3DViT
    from gfe_mamba_tpu.training.classify_trainer import ClassifyTrainer
    from gfe_mamba_tpu.training.gan_trainer import GanTrainer

    rng_np = np.random.default_rng(1000 + seed)
    tr, te = cohort["train"], cohort["test"]
    gen_kwargs = dict(f_maps=F_MAPS, fold_factor=8, vit_patch_size=4,
                      vit_dim=VIT["dim"], vit_depth=VIT["depth"],
                      vit_heads=VIT["heads"], vit_mlp_dim=VIT["mlp_dim"])

    def vol(a):
        return jnp.asarray(a[..., None])         # channels-last

    # ---- Stage 1: L1 only (adv gate 0, perceptual weight 0) ----
    generator = ResidualMidUNet3DViT(1, 1, is_segmentation=False,
                                     **gen_kwargs)
    disc = PatchDiscriminator(num_layers_d=2, num_channels=4)
    trainer1 = GanTrainer(generator, disc, PerceptualLoss(fake_3d_ratio=0.5),
                          lr_g=1e-4, perceptual_weight=0.0,
                          mixed_precision="none")
    key = jax.random.key(seed)
    sample = vol(tr["mri"][:batch])
    state1 = trainer1.init_state(key, sample, sample)
    adv_off = jnp.float32(0.0)
    for epoch in range(epochs1):
        losses = []
        for idx in _epoch_batches(rng_np, len(tr["mri"]), batch):
            key, sub = jax.random.split(key)
            state1, logs = trainer1.train_step(
                state1, vol(tr["mri"][idx]), vol(tr["pet"][idx]),
                adv_off, sub)
            losses.append(float(logs["l1"]))
        if verbose:
            print(f"[jax] stage1 epoch {epoch + 1}: "
                  f"l1={np.mean(losses):.4f}", flush=True)

    # ---- Stage 2: frozen generator via optimizer mask ----
    model = build_gfe_mamba(categories=cohort["categories"],
                            num_continuous=cohort["num_continuous"],
                            dim=DIM, depth=DEPTH, heads=HEADS,
                            seq_length=SEQ_LENGTH, **gen_kwargs)
    trainer2 = ClassifyTrainer(model, lr=1e-4, mixed_precision="none")
    key, sub = jax.random.split(key)
    state2 = trainer2.init_state(
        sub, vol(tr["mri"][:batch]), jnp.asarray(tr["x_cat"][:batch]),
        jnp.asarray(tr["x_num"][:batch]),
        generator_params=state1.g_params["params"])
    for epoch in range(epochs2):
        losses = []
        for idx in _epoch_batches(rng_np, len(tr["mri"]), batch):
            key, sub = jax.random.split(key)
            state2, logs = trainer2.train_step(
                state2, vol(tr["mri"][idx]), jnp.asarray(tr["x_cat"][idx]),
                jnp.asarray(tr["x_num"][idx]),
                jnp.asarray(tr["y"][idx].astype(np.float32)), sub)
            losses.append(float(logs["cla_loss"]))
        if verbose:
            print(f"[jax] stage2 epoch {epoch + 1}: "
                  f"bce={np.mean(losses):.4f}", flush=True)

    preds = []
    for i in range(0, len(te["mri"]), batch):
        sl = slice(i, i + batch)
        probs, _, _ = trainer2.eval_step(
            state2.params, vol(te["mri"][sl]), jnp.asarray(te["x_cat"][sl]),
            jnp.asarray(te["x_num"][sl]),
            jnp.asarray(te["y"][sl].astype(np.float32)))
        preds.append(np.asarray(probs) >= 0.5)
    return metrics_from_preds(np.concatenate(preds), te["y"])


# ---------------------------------------------------------------------------

def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="QUALITY_r02.json")
    parser.add_argument("--seeds", type=int, nargs="*", default=[0, 1, 2])
    parser.add_argument("--epochs1", type=int, default=20)
    parser.add_argument("--epochs2", type=int, default=60)
    parser.add_argument("--smoke", action="store_true",
                        help="tiny cohort / 1 epoch (CI smoke)")
    parser.add_argument("--hard", action="store_true",
                        help="harder cohort (weaker signals, more noise)"
                             " so neither side saturates F1=1.0")
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import torch
    torch.set_num_threads(1)

    if args.smoke:
        args.seeds, args.epochs1, args.epochs2 = [0], 1, 1
    if args.hard:
        global HARD
        HARD = True

    runs = []
    for seed in args.seeds:
        cohort = make_cohort(seed,
                             n_train=32 if args.smoke else 128,
                             n_test=16 if args.smoke else 192)
        t0 = time.time()
        m_torch = run_torch(cohort, seed, args.epochs1, args.epochs2,
                            verbose=args.verbose)
        t1 = time.time()
        m_jax = run_jax(cohort, seed, args.epochs1, args.epochs2,
                        verbose=args.verbose)
        t2 = time.time()
        runs.append({"seed": seed, "torch_reference": m_torch,
                     "gfe_mamba_tpu": m_jax,
                     "torch_seconds": round(t1 - t0, 1),
                     "jax_seconds": round(t2 - t1, 1)})
        print(json.dumps(runs[-1]), flush=True)

    def mean(side, key):
        return float(np.mean([r[side][key] for r in runs]))

    summary = {
        "config": {"shape": SHAPE, "f_maps": F_MAPS, "dim": DIM,
                   "depth": DEPTH, "heads": HEADS,
                   "seq_length": SEQ_LENGTH,
                   "epochs1": args.epochs1, "epochs2": args.epochs2,
                   "seeds": args.seeds,
                   "note": ("identical synthetic cohort, L1-only stage-1 "
                            "on both sides; see tools/quality_parity.py "
                            "docstring")},
        "torch_reference": {k: round(mean("torch_reference", k), 4)
                            for k in runs[0]["torch_reference"]},
        "gfe_mamba_tpu": {k: round(mean("gfe_mamba_tpu", k), 4)
                          for k in runs[0]["gfe_mamba_tpu"]},
        "runs": runs,
    }
    # signed: positive = the rebuild BEATS the torch reference
    summary["delta_f1_pt"] = round(100 * (
        summary["gfe_mamba_tpu"]["f1"]
        - summary["torch_reference"]["f1"]), 2)
    summary["delta_mcc_pt"] = round(100 * (
        summary["gfe_mamba_tpu"]["mcc"]
        - summary["torch_reference"]["mcc"]), 2)
    # north star: "within 0.5 pt" = not WORSE by more than 0.5 pt
    # (matching or beating the reference passes)
    summary["within_half_point"] = bool(summary["delta_f1_pt"] >= -0.5
                                        and summary["delta_mcc_pt"] >= -0.5)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("torch_reference", "gfe_mamba_tpu", "delta_f1_pt",
                       "delta_mcc_pt", "within_half_point")}))


if __name__ == "__main__":
    main()
