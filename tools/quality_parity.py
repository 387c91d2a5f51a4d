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
    # num0 pure noise), the image contrast sits near the noise floor,
    # AND 15% of subjects express the OPPOSITE imaging phenotype
    # (irreducible label noise).  The last knob pins the Bayes accuracy
    # at ~0.85 regardless of model power, so converged quality lands in
    # the mid-0.8s -- the sub-ceiling operating point where a real
    # quality difference between the frameworks is actually resolvable
    # (round-2 --hard still saturated at F1~0.99).
    img_gap = 0.10 if HARD else 0.40     # bright-blob contrast
    vent_gap = 0.5 if HARD else 2.0      # ventricle radius delta
    noise = 0.35 if HARD else 0.16
    flip_p = 0.5 if HARD else 0.2
    num_scale = 0.0 if HARD else 1.0
    express_p = 0.15 if HARD else 0.0    # P(opposite imaging phenotype)

    def blob(cx, cy, cz, r):
        return np.exp(-(((x - cx) ** 2 + (y - cy) ** 2
                         + (z - cz) ** 2) / (2 * r ** 2)))

    express_flip = rng.random(n) < express_p
    mris, pets = [], []
    for lab, eflip in zip(labels, express_flip):
        phen = (1 - lab) if eflip else lab           # expressed phenotype
        bright = (0.95 - img_gap) if phen else 0.95  # "atrophy" signal
        vent = (2.5 + vent_gap) if phen else 2.5     # ventricle radius
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


def recon_metrics(recon: np.ndarray, pet: np.ndarray) -> dict:
    """Stage-1 test-set reconstruction quality (L1 + PSNR over the
    [-1, 1] target range) -- localizes any classifier-metric delta to
    the generator vs the downstream feature path."""
    l1 = float(np.mean(np.abs(recon - pet)))
    mse = float(np.mean((recon - pet) ** 2))
    psnr = float(10 * np.log10(4.0 / mse)) if mse > 0 else float("inf")
    return {"stage1_l1": l1, "stage1_psnr": psnr}


def _epoch_batches(rng: np.random.Generator, n: int, batch: int):
    order = rng.permutation(n)
    for i in range(0, n - batch + 1, batch):
        yield order[i:i + batch]


# ---------------------------------------------------------------------------
# torch twins for the GAN game (--gan): a 3D PatchGAN discriminator
# structurally identical to gfe_mamba_tpu.models.discriminator (which
# mirrors the MONAI PatchDiscriminator config of main_gan_vit.py:33-40)
# and a perceptual loss computing the SAME function as
# gfe_mamba_tpu.losses.perceptual.PerceptualLoss -- its SqueezeNet
# feature net carries the IDENTICAL fixed-seed weights (imported from
# the jax module), so the perceptual term itself is compared, not two
# different random feature nets.

GAN = False
WARM_EPOCHS = 5          # adversarial term enters at epoch > WARM_EPOCHS
ADV_WEIGHT = 0.01        # main_gan_vit.py:43
PERC_WEIGHT = 0.001      # main_gan_vit.py:44


def _build_torch_patchgan(torch, num_layers_d=3, num_channels=32):
    """models/discriminator.py twin: k4 convs, InstanceNorm(affine),
    LeakyReLU(0.2), per-dim widened padding for toy volumes."""
    nn = torch.nn
    F = torch.nn.functional

    def pads_for(shape, kernel=4):
        out = []
        for n in shape:
            lo = 1
            hi = max(1, kernel - n - lo)
            out.append((lo, hi))
        return out

    class PadConv(nn.Module):
        def __init__(self, cin, cout, stride, bias=True):
            super().__init__()
            self.conv = nn.Conv3d(cin, cout, 4, stride, padding=0,
                                  bias=bias)

        def forward(self, x):
            pads = pads_for(x.shape[2:])
            flat = []
            for lo, hi in reversed(pads):     # F.pad is last-dim-first
                flat += [lo, hi]
            return self.conv(F.pad(x, flat))

    class TorchPatchGAN(nn.Module):
        def __init__(self):
            super().__init__()
            layers = [PadConv(1, num_channels, 2)]
            ch = num_channels
            self.norms = nn.ModuleList()
            for _ in range(1, num_layers_d):
                layers.append(PadConv(ch, ch * 2, 2, bias=False))
                self.norms.append(nn.InstanceNorm3d(ch * 2, affine=True,
                                                    eps=1e-6))
                ch *= 2
            layers.append(PadConv(ch, ch * 2, 1, bias=False))
            self.norms.append(nn.InstanceNorm3d(ch * 2, affine=True,
                                                eps=1e-6))
            layers.append(PadConv(ch * 2, 1, 1))
            self.layers = nn.ModuleList(layers)

        def forward(self, x):
            feats = []
            x = F.leaky_relu(self.layers[0](x), 0.2)
            feats.append(x)
            for i, conv in enumerate(self.layers[1:-1]):
                x = F.leaky_relu(self.norms[i](conv(x)), 0.2)
                feats.append(x)
            feats.append(self.layers[-1](x))
            return feats

    model = TorchPatchGAN()
    # MONAI PatchDiscriminator.initialise_weights (DCGAN convention),
    # mirrored by models/discriminator.py dcgan_init
    for mod in model.modules():
        if isinstance(mod, nn.Conv3d):
            nn.init.normal_(mod.weight, 0.0, 0.02)
            if mod.bias is not None:
                nn.init.zeros_(mod.bias)
        elif isinstance(mod, nn.InstanceNorm3d) and mod.affine:
            nn.init.normal_(mod.weight, 1.0, 0.02)
            nn.init.zeros_(mod.bias)
    return model


def _build_torch_perceptual(torch, fake_3d_ratio=0.25, seed=0):
    """losses/perceptual.py twin with the SAME fixed-seed weights.

    Builds the jax SqueezeFeatures params for ``seed``, converts each
    conv kernel (kh, kw, in, out) -> (out, in, kh, kw), and evaluates
    the identical slice/resize/normalize/compare pipeline in torch
    (gradients flow to the generator through it)."""
    import jax
    from gfe_mamba_tpu.losses.perceptual import PerceptualLoss as JaxPL

    jpl = JaxPL(fake_3d_ratio=fake_3d_ratio, seed=seed)
    jp = jax.tree_util.tree_map(np.asarray, jpl.params)["params"]
    nn, F = torch.nn, torch.nn.functional

    def conv_from(tree, cout_pad=None):
        k = np.transpose(tree["kernel"], (3, 2, 0, 1))
        conv = nn.Conv2d(k.shape[1], k.shape[0], k.shape[2:],
                         padding=cout_pad or 0)
        conv.weight.data = torch.from_numpy(np.ascontiguousarray(k))
        conv.bias.data = torch.from_numpy(np.ascontiguousarray(
            tree["bias"]))
        return conv

    class Fire(nn.Module):
        def __init__(self, tree):
            super().__init__()
            self.squeeze = conv_from(tree["squeeze"])
            self.e1 = conv_from(tree["expand1x1"])
            self.e3 = conv_from(tree["expand3x3"], cout_pad=1)

        def forward(self, x):
            s = F.relu(self.squeeze(x))
            return torch.cat([F.relu(self.e1(s)), F.relu(self.e3(s))], 1)

    class Feats(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 3, stride=2)   # VALID
            k = np.transpose(jp["conv1"]["kernel"], (3, 2, 0, 1))
            self.conv1.weight.data = torch.from_numpy(
                np.ascontiguousarray(k))
            self.conv1.bias.data = torch.from_numpy(
                np.ascontiguousarray(jp["conv1"]["bias"]))
            self.fires = nn.ModuleList(
                [Fire(jp[f"fire{i}"]) for i in range(1, 9)])

        def forward(self, x):
            taps = []
            x = F.relu(self.conv1(x))
            taps.append(x)
            x = F.max_pool2d(x, 3, 2)
            x = self.fires[1 - 1](x)
            x = self.fires[2 - 1](x)
            taps.append(x)
            x = F.max_pool2d(x, 3, 2)
            x = self.fires[3 - 1](x)
            x = self.fires[4 - 1](x)
            taps.append(x)
            x = F.max_pool2d(x, 3, 2)
            x = self.fires[5 - 1](x)
            x = self.fires[6 - 1](x)
            taps.append(x)
            x = self.fires[7 - 1](x)
            x = self.fires[8 - 1](x)
            taps.append(x)
            return taps

    net = Feats()
    for p in net.parameters():
        p.requires_grad_(False)

    def normalize(f):
        return f / (torch.sqrt((f ** 2).sum(1, keepdim=True)) + 1e-10)

    def lpips_2d(pred, tgt):
        h, w = pred.shape[2:]
        if min(h, w) < 32:
            scale = 32 / min(h, w)
            size = (max(32, int(h * scale)), max(32, int(w * scale)))
            pred = F.interpolate(pred, size=size, mode="bilinear",
                                 align_corners=False)
            tgt = F.interpolate(tgt, size=size, mode="bilinear",
                                align_corners=False)
        total = 0.0
        for a, b in zip(net(pred.expand(-1, 3, -1, -1)),
                        net(tgt.expand(-1, 3, -1, -1))):
            total = total + ((normalize(a) - normalize(b)) ** 2).sum(
                1).mean()
        return total

    def slices(vol, axis):
        # vol: (B, 1, X, Y, Z); evenly strided 2D slices along axis
        sp = axis + 2
        n = vol.shape[sp]
        take = max(1, int(n * fake_3d_ratio))
        idx = torch.from_numpy(
            np.linspace(0, n - 1, take).astype(np.int64))
        sl = torch.index_select(vol, sp, idx)
        sl = torch.movedim(sl, sp, 1).flatten(0, 1)   # (B*take, 1, h, w)
        return sl

    def loss(pred, tgt):
        total = 0.0
        for axis in range(3):
            total = total + lpips_2d(slices(pred, axis), slices(tgt, axis))
        return total / 3.0

    return loss


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

    # ---- Stage 1 (main_gan_vit.py:58-103).  Default: L1 only on both
    # sides.  --gan: the full game -- L1 + perceptual (identical
    # fixed-seed feature net on both sides) + warm-up-gated LSGAN term
    # with a PatchGAN twin of models/discriminator.py ----
    opt_g = torch.optim.Adam(gen.parameters(), lr=1e-4)
    disc = opt_d = p_loss_fn = None
    if GAN:
        disc = _build_torch_patchgan(torch)
        opt_d = torch.optim.Adam(disc.parameters(), lr=5e-4)
        p_loss_fn = _build_torch_perceptual(torch)
        disc.train()
    mse = torch.nn.functional.mse_loss
    gen.train()
    for epoch in range(epochs1):
        adv_on = GAN and (epoch + 1 > WARM_EPOCHS)
        losses = []
        for idx in _epoch_batches(rng, len(tr["mri"]), batch):
            mri = to_t(tr["mri"][idx])[:, None]
            pet = to_t(tr["pet"][idx])[:, None]
            recon = gen(mri)
            loss = torch.nn.functional.l1_loss(recon, pet)
            if GAN:
                loss = loss + PERC_WEIGHT * p_loss_fn(recon, pet)
            if adv_on:
                logits_fake = disc(recon)[-1]
                # generator trained towards "real" (main_gan_vit.py:76)
                loss = loss + ADV_WEIGHT * mse(
                    logits_fake, torch.ones_like(logits_fake))
            opt_g.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(gen.parameters(), 1.0)
            opt_g.step()
            if adv_on:
                # second no-grad generator forward (main_gan_vit.py:87)
                with torch.no_grad():
                    recon_d = gen(mri)
                logits_fake = disc(recon_d.detach())[-1]
                logits_real = disc(pet)[-1]
                loss_d = ADV_WEIGHT * 0.5 * (
                    mse(logits_fake, torch.zeros_like(logits_fake))
                    + mse(logits_real, torch.ones_like(logits_real)))
                opt_d.zero_grad()
                loss_d.backward()
                opt_d.step()
            losses.append(float(loss.detach()))
        if verbose:
            print(f"[torch] stage1 epoch {epoch + 1}: "
                  f"g={np.mean(losses):.4f} adv_on={adv_on}", flush=True)
    gen.eval()
    with torch.no_grad():
        rec = np.concatenate(
            [gen(to_t(te["mri"][i:i + batch])[:, None]).numpy()[:, 0]
             for i in range(0, len(te["mri"]), batch)])
    s1_metrics = recon_metrics(rec, te["pet"])

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
    return {**metrics_from_preds(np.concatenate(preds), te["y"]),
            **s1_metrics}


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

    # ---- Stage 1.  Default: L1 only (adv gate 0, perceptual weight 0).
    # --gan: LSGAN + perceptual with the same weights/warm-up as the
    # torch side (the fixed-seed perceptual feature net is numerically
    # IDENTICAL on both sides; during warm-up the D optimizer sees
    # zeroed grads, a no-op update vs torch's skipped step) ----
    generator = ResidualMidUNet3DViT(1, 1, is_segmentation=False,
                                     **gen_kwargs)
    if GAN:
        disc = PatchDiscriminator(num_layers_d=3, num_channels=32)
        # d_fresh_recon: the reference's second post-update generator
        # forward for the D step (main_gan_vit.py:86-88)
        trainer1 = GanTrainer(generator, disc,
                              PerceptualLoss(fake_3d_ratio=0.25, seed=0),
                              lr_g=1e-4, lr_d=5e-4,
                              adv_weight=ADV_WEIGHT,
                              perceptual_weight=PERC_WEIGHT,
                              mixed_precision="none",
                              d_fresh_recon=True)
    else:
        disc = PatchDiscriminator(num_layers_d=2, num_channels=4)
        trainer1 = GanTrainer(generator, disc,
                              PerceptualLoss(fake_3d_ratio=0.5),
                              lr_g=1e-4, perceptual_weight=0.0,
                              mixed_precision="none")
    key = jax.random.key(seed)
    sample = vol(tr["mri"][:batch])
    state1 = trainer1.init_state(key, sample, sample)
    for epoch in range(epochs1):
        adv_on = jnp.float32(1.0 if GAN and (epoch + 1 > WARM_EPOCHS)
                             else 0.0)
        losses = []
        for idx in _epoch_batches(rng_np, len(tr["mri"]), batch):
            key, sub = jax.random.split(key)
            state1, logs = trainer1.train_step(
                state1, vol(tr["mri"][idx]), vol(tr["pet"][idx]),
                adv_on, sub)
            losses.append(float(logs["l1"]))
        if verbose:
            print(f"[jax] stage1 epoch {epoch + 1}: "
                  f"l1={np.mean(losses):.4f} adv_on={float(adv_on)}",
                  flush=True)

    # stage-1 recon quality BEFORE state2 exists: the classify train
    # state donates buffers shared with state1.g_params
    rec = np.concatenate(
        [np.asarray(trainer1.generate(state1.g_params,
                                      vol(te["mri"][i:i + batch])))[..., 0]
         for i in range(0, len(te["mri"]), batch)])
    s1_metrics = recon_metrics(rec, te["pet"])

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
    return {**metrics_from_preds(np.concatenate(preds), te["y"]),
            **s1_metrics}


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
    parser.add_argument("--gan", action="store_true",
                        help="train stage-1 with the FULL game on both "
                             "sides: LSGAN + warm-up + identical-weights "
                             "perceptual term (main_gan_vit.py:33-50)")
    parser.add_argument("--n-test", type=int, default=192)
    parser.add_argument("--platform", default="cpu", choices=["cpu", "tpu"],
                        help="device for the JAX side (the torch side is "
                             "always host CPU); tpu makes multi-seed runs "
                             "tractable at ~35 ms/dispatch")
    parser.add_argument("--matmul-precision", default="highest",
                        choices=["default", "high", "highest"],
                        help="jax_default_matmul_precision for the JAX "
                             "side.  On TPU, f32 matmuls/convs otherwise "
                             "compute in bf16 while the torch-CPU "
                             "reference computes true f32 -- 'highest' "
                             "is the apples-to-apples setting (no-op on "
                             "CPU)")
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("--reuse-torch", default=None, metavar="FROM.json",
                        help="skip the torch side and copy its per-seed "
                             "metrics from a previous artifact (cohorts "
                             "are seed-deterministic, so this is exact); "
                             "for cheap JAX-side ablations")
    args = parser.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if args.matmul_precision != "default":
        jax.config.update("jax_default_matmul_precision",
                          args.matmul_precision)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import torch
    torch.set_num_threads(1)

    if args.smoke:
        args.seeds, args.epochs1, args.epochs2 = [0], 1, 1
        if args.gan:
            # exercise the adversarial branch in the single smoke epoch
            global WARM_EPOCHS
            WARM_EPOCHS = 0
    if args.hard:
        global HARD
        HARD = True
    if args.gan:
        global GAN
        GAN = True

    reuse = None
    if args.reuse_torch:
        with open(args.reuse_torch) as f:
            prior = json.load(f)
        # the torch metrics are only reusable if they came from the
        # SAME experiment definition (cohorts are seed-deterministic
        # given these fields)
        want = {"shape": list(SHAPE), "f_maps": list(F_MAPS), "dim": DIM,
                "depth": DEPTH, "heads": HEADS, "seq_length": SEQ_LENGTH,
                "epochs1": args.epochs1, "epochs2": args.epochs2,
                "n_test": args.n_test, "gan": bool(args.gan),
                "hard": bool(HARD)}
        pc = prior.get("config", {})
        for k, v in want.items():
            if pc.get(k) != v:
                raise SystemExit(
                    f"--reuse-torch {args.reuse_torch}: config[{k!r}] = "
                    f"{pc.get(k)!r} does not match this run's {v!r}; the "
                    f"prior torch metrics are not comparable")
        reuse = {r["seed"]: r["torch_reference"] for r in prior["runs"]}

    runs = []
    for seed in args.seeds:
        cohort = make_cohort(seed,
                             n_train=32 if args.smoke else 128,
                             n_test=16 if args.smoke else args.n_test)
        t0 = time.time()
        if reuse is not None:
            m_torch = reuse[seed]
        else:
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
                   "seeds": args.seeds, "n_test": args.n_test,
                   "gan": bool(args.gan), "hard": bool(HARD),
                   "platform": args.platform,
                   "matmul_precision": args.matmul_precision,
                   "warm_epochs": WARM_EPOCHS if args.gan else None,
                   "note": ("identical synthetic cohort; stage-1 "
                            + ("FULL GAN (LSGAN+warm-up+identical-weights "
                               "perceptual) on both sides"
                               if args.gan else "L1-only on both sides")
                            + "; see tools/quality_parity.py docstring")},
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
