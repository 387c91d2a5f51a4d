#!/usr/bin/env python
"""Full-pipeline evaluation entry point (Precision/Recall/F1/Acc/MCC).

CLI-compatible re-implementation of the reference test_mamba.py:
``python test_mamba.py --config_path configs/classify_mamba_config_test.yaml``.
``pth_dir`` holds the Stage-2 checkpoints (best_* or *_current npz),
``gan_ckpt`` the Stage-1 generator weights, ``use_best`` picks which.

Implements the INTENDED semantics where the reference has bugs
(SURVEY.md 3.3): the image condition is the [MRI, generated PET] pair
(the reference passes the bare tensor, test_mamba.py:85, which is
incompatible with Cross_mamba_both), and metrics receive
(predictions, targets) in the correct order.
"""

from __future__ import annotations

import argparse
from os.path import join

import jax.numpy as jnp
import numpy as np

from gfe_mamba_tpu.config import load_config
from gfe_mamba_tpu.data.datasets import classi_dataloader
from gfe_mamba_tpu.models.pipeline import build_gfe_mamba
from gfe_mamba_tpu.training.checkpoint import load_params_npz
from gfe_mamba_tpu.training.classify_trainer import ClassifyTrainer
from gfe_mamba_tpu.training.metrics import metrics_from_counts
from gfe_mamba_tpu.utils.experiment import ExperimentDir


def main(args):
    cf = load_config(args.config_path)
    exp = ExperimentDir(args.config_path,
                        cf.get("project_dir", "weights/classifier"),
                        is_debug=cf.get("is_debug", True),
                        program_name="test_mamba")
    val_loader = classi_dataloader(
        cf["eval_path"], tuple(cf["img_sz"]), cf["eval_bc"],
        cf["table_path"], shuffle=False,
        days_threshold=cf.get("days_threshold", -1),
        num_workers=cf.get("num_workers", 2))
    dataset = val_loader.dataset

    pipeline = build_gfe_mamba(
        categories=dataset.num_cat, num_continuous=dataset.num_cont,
        dim=cf["dim"], depth=cf["depth"], heads=cf["heads"],
        dim_out=cf.get("dim_out", 1),
        attn_dropout=cf.get("attn_dropout", 0.1),
        ff_dropout=cf.get("ff_dropout", 0.1),
        seq_length=cf.get("seq_length", 4),
        f_maps=tuple(cf.get("f_maps", (64, 128, 256))),
        mixer=cf.get("mixer", "mamba"),
        **{k: cf[k] for k in ("fold_factor", "vit_patch_size", "vit_dim",
                              "vit_depth", "vit_heads", "vit_mlp_dim")
           if k in cf})
    trainer = ClassifyTrainer(pipeline)

    import jax
    img_sz = tuple(cf["img_sz"])
    params = pipeline.init(
        jax.random.key(0),
        jnp.zeros((1,) + img_sz + (1,), jnp.float32),
        jnp.zeros((1, len(dataset.num_cat)), jnp.int32),
        jnp.zeros((1, dataset.num_cont), jnp.float32))

    inner = dict(params["params"])
    if cf.get("gan_ckpt"):
        if cf["gan_ckpt"].endswith((".pt", ".pth")):
            from gfe_mamba_tpu.utils.torch_import import (
                import_generator, load_torch_state_dict)
            inner["generator"] = import_generator(
                load_torch_state_dict(cf["gan_ckpt"]), inner["generator"])
        else:
            inner["generator"] = load_params_npz(cf["gan_ckpt"],
                                                 inner["generator"])
    if cf.get("pth_dir"):
        import os
        prefix = "best_" if cf.get("use_best", False) else ""
        suffix = "" if cf.get("use_best", False) else "_current"
        comb_path = join(cf["pth_dir"], f"{prefix}model{suffix}")
        cls_path = join(cf["pth_dir"], f"{prefix}ft_model{suffix}")
        if os.path.exists(comb_path + ".pth"):
            # reference torch Stage-2 checkpoints (classify_mamba.py:158-172)
            from gfe_mamba_tpu.utils.torch_import import (
                import_classifier, import_combiner, load_torch_state_dict)
            inner["combiner"] = import_combiner(
                load_torch_state_dict(comb_path + ".pth"), inner["combiner"])
            inner["classifier"] = import_classifier(
                load_torch_state_dict(cls_path + ".pth"), inner["classifier"])
        else:
            inner["combiner"] = load_params_npz(comb_path + ".npz",
                                                inner["combiner"])
            inner["classifier"] = load_params_npz(cls_path + ".npz",
                                                  inner["classifier"])
    params = {**params, "params": inner}

    counts, losses, total = None, 0.0, 0
    for batch in val_loader:
        probs, loss, c = trainer.eval_step(
            params, jnp.asarray(batch["image"]),
            jnp.asarray(batch["cate_x"]), jnp.asarray(batch["conti_x"]),
            jnp.asarray(batch["label"]))
        counts = c if counts is None else counts + c
        losses += float(loss) * len(batch["label"])
        total += len(batch["label"])

    m = metrics_from_counts(counts)
    validation_loss = losses / max(total, 1)
    print(f"Acc: {float(m.accuracy) * 100: .4f}")
    print(f"Recall: {float(m.recall): .4f}")
    print(f"F1: {float(m.f1):.4f}")
    print(f"Pre: {float(m.precision):.4f}")
    print(f"MCC: {float(m.mcc):.4f}")
    print(f"Val_loss: {validation_loss: .4f} \n")
    exp.write(f"Acc: {float(m.accuracy) * 100: .4f}% "
              f"Recall: {float(m.recall): .4f} F1: {float(m.f1):.4f} "
              f"Pre: {float(m.precision):.4f} MCC: {float(m.mcc):.4f} "
              f"Val_loss: {validation_loss: .4f} \n")
    exp.close()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", type=str,
                        default="configs/classify_mamba_config_test.yaml")
    main(parser.parse_args())
