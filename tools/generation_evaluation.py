#!/usr/bin/env python
"""Dump side-by-side MRI | PET | reconstruction slice grids for a
trained Stage-1 generator (reference utils/generation_evaluation_vit.py:
34-42: 20 batches of comparison PNGs), plus PSNR/MSE fidelity numbers.

Usage: python tools/generation_evaluation.py --config_path <gan yaml>
       --ckpt <model.npz> [--num_batches 20] [--out_dir gen_eval]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gfe_mamba_tpu.config import load_config
from gfe_mamba_tpu.data.datasets import form_dataloader
from gfe_mamba_tpu.models.unet3d import ResidualMidUNet3DViT
from gfe_mamba_tpu.segmentation.metrics import psnr
from gfe_mamba_tpu.training.checkpoint import load_params_npz
from gfe_mamba_tpu.utils.experiment import save_volume_grid


def main(args):
    cf = load_config(args.config_path)
    loader = form_dataloader(cf["eval_path"], tuple(cf["img_sz"]),
                             cf.get("eval_bc", 1), shuffle=False)
    generator = ResidualMidUNet3DViT(
        1, 1, is_segmentation=False,
        f_maps=tuple(cf.get("f_maps", (64, 128, 256))),
        **{k: cf[k] for k in ("fold_factor", "vit_patch_size", "vit_dim",
                              "vit_depth", "vit_heads", "vit_mlp_dim")
           if k in cf})
    sample = jnp.zeros((cf.get("eval_bc", 1),) + tuple(cf["img_sz"]) + (1,))
    variables = generator.init(jax.random.key(0), sample)
    variables = {"params": load_params_npz(args.ckpt, variables["params"])}
    fwd = jax.jit(generator.apply)

    os.makedirs(args.out_dir, exist_ok=True)
    psnrs, mses = [], []
    for i, batch in enumerate(loader):
        if i >= args.num_batches:
            break
        mri = jnp.asarray(batch["image"])
        pet = jnp.asarray(batch["label"])
        recon = fwd(variables, mri)
        psnrs.append(float(psnr(recon, pet)))
        mses.append(float(jnp.mean((recon - pet) ** 2)))
        panel = np.concatenate(
            [np.asarray(mri), np.asarray(pet), np.asarray(recon)], axis=1)
        save_volume_grid(panel, os.path.join(args.out_dir, f"{i + 1}.png"))
    print(f"batches={len(psnrs)} PSNR={np.mean(psnrs):.3f} "
          f"MSE={np.mean(mses):.6f}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", required=True)
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--num_batches", type=int, default=20)
    parser.add_argument("--out_dir", default="gen_eval")
    main(parser.parse_args())
