#!/usr/bin/env python
"""Stage-2 multimodal Mamba classifier training entry point.

CLI-compatible re-implementation of the reference classify_mamba.py:
``python classify_mamba.py --config_path configs/classify_mamba_config.yaml``
with the same YAML keys (train_path/eval_path/table_path/days_threshold/
dim/depth/heads/seq_length/f_maps/...).  Key ``gan_ckpt`` points at the
Stage-1 ``model.npz`` (the reference hardcodes an absolute path,
classify_mamba.py:37).

The full pipeline (frozen generator -> combiner -> Mamba fusion head)
runs as ONE jitted train step; generator freezing is an optimizer mask.
Metrics are computed with the intended (preds, targets) argument order
(the reference swaps them -- SURVEY.md 3.3).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from gfe_mamba_tpu.config import load_config
from gfe_mamba_tpu.data.datasets import classi_dataloader
from gfe_mamba_tpu.models.pipeline import build_gfe_mamba
from gfe_mamba_tpu.parallel import multihost
from gfe_mamba_tpu.parallel.mesh import make_mesh
from gfe_mamba_tpu.training.checkpoint import (
    BestTracker, load_params_npz, save_params_npz,
)
from gfe_mamba_tpu.training.classify_trainer import ClassifyTrainer
from gfe_mamba_tpu.training.metrics import metrics_from_counts
from gfe_mamba_tpu.utils.experiment import (
    ExperimentDir, count_parameters, save_plot_data,
)


def build_everything(cf: dict):
    img_sz = tuple(cf["img_sz"])
    nproc = jax.process_count()
    shard = (jax.process_index(), nproc) if nproc > 1 else None
    if cf["train_bc"] % max(nproc, 1):
        raise ValueError(f"train_bc {cf['train_bc']} not divisible by "
                         f"{nproc} processes")
    train_loader = classi_dataloader(
        cf["train_path"], img_sz, cf["train_bc"] // max(nproc, 1),
        cf["table_path"],
        shuffle=True, days_threshold=cf.get("days_threshold", -1),
        num_workers=cf.get("num_workers", 2), seed=cf.get("seed", 0),
        process_shard=shard)
    val_loader = classi_dataloader(
        cf["eval_path"], img_sz, cf["eval_bc"], cf["table_path"],
        shuffle=False, days_threshold=cf.get("days_threshold", -1),
        num_workers=cf.get("num_workers", 2))
    dataset = train_loader.dataset
    pipeline = build_gfe_mamba(
        categories=dataset.num_cat, num_continuous=dataset.num_cont,
        dim=cf["dim"], depth=cf["depth"], heads=cf["heads"],
        dim_out=cf.get("dim_out", 1), attn_dropout=cf.get("attn_dropout", 0.1),
        ff_dropout=cf.get("ff_dropout", 0.1),
        seq_length=cf.get("seq_length", 4),
        f_maps=tuple(cf.get("f_maps", (64, 128, 256))),
        mixer=cf.get("mixer", "mamba"), remat=cf.get("remat", False),
        **{k: cf[k] for k in ("fold_factor", "vit_patch_size", "vit_dim",
                              "vit_depth", "vit_heads", "vit_mlp_dim")
           if k in cf})
    return train_loader, val_loader, pipeline


def run_validation(trainer, params, val_loader, epoch, exp):
    all_preds, all_targets = [], []
    losses, total = 0.0, 0
    counts = None
    for batch in val_loader:
        bc = len(batch["label"])
        cate = jnp.asarray(batch["cate_x"]) if "cate_x" in batch \
            else jnp.zeros((bc, 0), jnp.int32)
        conti = jnp.asarray(batch["conti_x"]) if "conti_x" in batch \
            else jnp.zeros((bc, 0), jnp.float32)
        probs, loss, c = trainer.eval_step(
            params, jnp.asarray(batch["image"]), cate, conti,
            jnp.asarray(batch["label"]))
        all_preds.append(np.asarray(probs))
        all_targets.append(np.asarray(batch["label"]))
        losses += float(loss) * len(batch["label"])
        total += len(batch["label"])
        counts = c if counts is None else counts + c
    metrics = metrics_from_counts(counts)
    val_loss = losses / max(total, 1)
    if not exp.is_debug:
        save_plot_data(epoch + 1, np.concatenate(all_preds),
                       np.concatenate(all_targets), exp.path("val_data"))
    return metrics, val_loss


def main(args):
    multihost.initialize()  # no-op single-process
    cf = load_config(args.config_path)
    exp = ExperimentDir(args.config_path,
                        cf.get("project_dir", "weights/classifier"),
                        is_debug=cf.get("is_debug", False),
                        log_with=cf.get("log_with", ""),
                        program_name="classify_mamba")
    mesh = make_mesh()
    train_loader, val_loader, pipeline = build_everything(cf)
    trainer = ClassifyTrainer(pipeline, lr=cf.get("lr", 1e-4),
                              grad_clip=cf.get("grad_clip", 1.0),
                              mixed_precision=cf.get("mixed_precision",
                                                     "bf16"),
                              # torch-law classifier init (same
                              # convergence physics as g_init, see
                              # classify_trainer.py)
                              init=cf.get("cls_init", "torch"))

    img_sz = tuple(cf["img_sz"])
    dataset = train_loader.dataset
    rng = jax.random.key(cf.get("seed", 0))
    sample_mri = jnp.zeros((cf["train_bc"],) + img_sz + (1,), jnp.float32)
    sample_cat = jnp.zeros((cf["train_bc"], len(dataset.num_cat)), jnp.int32)
    sample_num = jnp.zeros((cf["train_bc"], dataset.num_cont), jnp.float32)
    state = trainer.init_state(rng, sample_mri, sample_cat, sample_num)

    if cf.get("gan_ckpt"):
        like = state.params["params"]["generator"]
        if cf["gan_ckpt"].endswith((".pt", ".pth")):
            # reference torch checkpoint (main_gan_vit.py:131-134)
            from gfe_mamba_tpu.utils.torch_import import (
                import_generator, load_torch_state_dict)
            gen_params = import_generator(
                load_torch_state_dict(cf["gan_ckpt"]), like)
        else:
            gen_params = load_params_npz(cf["gan_ckpt"], like)
        state = state._replace(params={**state.params, "params": {
            **state.params["params"], "generator": gen_params}})
        print(f"loaded Stage-1 generator from {cf['gan_ckpt']}")

    exp.write(f"The size of model: "
              f"{count_parameters(state.params['params'])} \n")
    # persist the fitted table preprocessor for eval/serving parity
    if not exp.is_debug and dataset.table is not None:
        with open(exp.path("table_preprocessor.json"), "w") as f:
            f.write(dataset.preprocessor.to_json())

    best = BestTracker()
    global_step = 0
    num_epochs = cf["num_epochs"]
    # non-finite steps are skipped in-jit (trainer guard); the strike
    # counter aborts a run that produces nothing but NaNs
    from gfe_mamba_tpu.training.resilience import StrikeCounter
    strikes = StrikeCounter(max_strikes=10)
    for epoch in range(num_epochs):
        for batch in train_loader:
            # tableless mode (table_path='') omits cate_x/conti_x
            sb = multihost.form_global_array(
                {k: batch[k] for k in
                 ("image", "cate_x", "conti_x", "label") if k in batch},
                mesh)
            if "cate_x" not in sb:
                sb["cate_x"] = jnp.zeros((sb["image"].shape[0], 0),
                                         jnp.int32)
                sb["conti_x"] = jnp.zeros((sb["image"].shape[0], 0),
                                          jnp.float32)
            rng, step_rng = jax.random.split(rng)
            state, logs = trainer.train_step(
                state, sb["image"], sb["cate_x"], sb["conti_x"],
                sb["label"], step_rng)
            if (multihost.is_main_process()
                    and global_step % cf.get("log_every", 10) == 0):
                logs = {k: float(v) for k, v in logs.items()}
                strikes.update(logs.pop("skipped", 0.0))
                exp.log_scalars(logs, global_step)
                print(f"epoch {epoch + 1}: " +
                      " ".join(f"{k}={v:.4f}" for k, v in logs.items()))
            global_step += 1

        do_val = ((epoch + 1) % cf["val_inter"] == 0
                  or epoch == num_epochs - 1)
        do_save = not exp.is_debug and (
            (epoch + 1) % cf["save_inter"] == 0 or epoch == num_epochs - 1)
        # collective pull of the (replicated) params to host numpy, so
        # validation/saving can run purely locally on process 0
        # (ADVICE r2: jit/orbax on global arrays must not be p0-gated)
        p_host = multihost.host_local(state.params) \
            if (do_val or do_save) else None
        if multihost.is_main_process() and do_val:
            metrics, val_loss = run_validation(
                trainer, p_host, val_loader, epoch, exp)
            accuracy = float(metrics.accuracy) * 100
            line = (f"Epoch {epoch + 1}: Acc: {accuracy: .4f}% "
                    f"Recall: {float(metrics.recall): .4f} "
                    f"F1: {float(metrics.f1):.4f} "
                    f"Val_loss: {val_loss: .4f} \n")
            print(line, end="")
            exp.write(line)
            exp.log_scalars({"accuracy": accuracy,
                             "recall": float(metrics.recall),
                             "f1": float(metrics.f1),
                             "validation_loss": val_loss}, global_step)
            if not exp.is_debug and best.is_better(accuracy, val_loss):
                save_params_npz(exp.path("model_best", "best_model.npz"),
                                p_host["params"]["combiner"])
                save_params_npz(exp.path("model_best", "best_ft_model.npz"),
                                p_host["params"]["classifier"])
                print("Saved best model")

        if multihost.is_main_process() and do_save:
            save_params_npz(exp.path("model_current", "model_current.npz"),
                            p_host["params"]["combiner"])
            save_params_npz(exp.path("model_current", "ft_model_current.npz"),
                            p_host["params"]["classifier"])
            print("Saved model")
    exp.close()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", type=str,
                        default="configs/classify_mamba_config.yaml")
    main(parser.parse_args())
