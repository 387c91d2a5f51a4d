#!/usr/bin/env python
"""Stage-1 GAN-ViT training entry point (MRI -> PET translation).

CLI-compatible re-implementation of the reference main_gan_vit.py:
``python main_gan_vit.py --config_path config/main_gan_vit_config.yaml``
with the same YAML keys (train_path/eval_path/train_bc/img_sz/
num_epochs/val_inter/save_inter/mixed_precision/project_dir/...).

Differences by design: one fused jitted G+D step per batch (the
reference runs the generator forward twice, main_gan_vit.py:69,87),
bf16 instead of fp16 AMP, data parallelism via a jax Mesh instead of
Accelerate/DDP, and full train-state checkpoints.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from gfe_mamba_tpu.config import load_config
from gfe_mamba_tpu.data.datasets import form_dataloader
from gfe_mamba_tpu.losses.perceptual import PerceptualLoss
from gfe_mamba_tpu.models.discriminator import PatchDiscriminator
from gfe_mamba_tpu.models.unet3d import ResidualMidUNet3DViT
from gfe_mamba_tpu.parallel import multihost
from gfe_mamba_tpu.parallel.mesh import make_mesh
from gfe_mamba_tpu.training.checkpoint import (
    AsyncCheckpointManager, Checkpointer, save_params_npz)
from gfe_mamba_tpu.training.gan_trainer import GanTrainer
from gfe_mamba_tpu.training.resilience import AutoResume, StrikeCounter
from gfe_mamba_tpu.utils.experiment import ExperimentDir, save_volume_grid


def main(args):
    multihost.initialize()  # no-op single-process (multihost.py docstring)
    cf = load_config(args.config_path)
    exp = ExperimentDir(args.config_path, cf.get("project_dir", "weights"),
                        is_debug=cf.get("is_debug", False),
                        log_with=cf.get("log_with", ""),
                        program_name="main_gan_vit")

    # per-process batch + disjoint dataset shard (multi-host DDP role of
    # Accelerate, reference main_gan_vit.py:31)
    nproc = jax.process_count()
    shard = (jax.process_index(), nproc) if nproc > 1 else None
    if cf["train_bc"] % max(nproc, 1):
        raise ValueError(f"train_bc {cf['train_bc']} not divisible by "
                         f"{nproc} processes")
    local_bc = cf["train_bc"] // max(nproc, 1)

    img_sz = tuple(cf["img_sz"])
    train_loader = form_dataloader(cf["train_path"], img_sz, local_bc,
                                   shuffle=True, seed=cf.get("seed", 0),
                                   num_workers=cf.get("num_workers", 2),
                                   process_shard=shard)
    val_loader = form_dataloader(cf["eval_path"], img_sz, cf["eval_bc"],
                                 shuffle=False,
                                 num_workers=cf.get("num_workers", 2))

    mesh = make_mesh()
    f_maps = tuple(cf.get("f_maps", (64, 128, 256)))
    generator = ResidualMidUNet3DViT(1, 1, is_segmentation=False,
                                     f_maps=f_maps,
                                     remat=cf.get("remat", True),
                                     **{k: cf[k] for k in
                                        ("fold_factor", "vit_patch_size",
                                         "vit_dim", "vit_depth", "vit_heads",
                                         "vit_mlp_dim") if k in cf})
    discriminator = PatchDiscriminator(num_layers_d=3, num_channels=32)
    perceptual = PerceptualLoss(fake_3d_ratio=0.25)

    trainer = GanTrainer(
        generator, discriminator, perceptual,
        lr_g=cf.get("lr_g", 1e-4), lr_d=cf.get("lr_d", 5e-4),
        adv_weight=cf.get("adv_weight", 0.01),
        perceptual_weight=cf.get("perceptual_weight", 0.001),
        grad_clip=cf.get("grad_clip", 1.0),
        mixed_precision=cf.get("mixed_precision", "bf16"),
        accum_steps=cf.get("gradient_accumulation_steps", 1),
        # true -> the reference's second post-update generator forward
        # for the D step (main_gan_vit.py:86-88); default shares the
        # forward (~30% faster step, slightly stale critic targets)
        d_fresh_recon=cf.get("d_fresh_recon", False),
        # torch-law generator init (utils/initializers.py): convergence-
        # critical -- flax-default init converges 2x worse recon L1
        g_init=cf.get("g_init", "torch"),
    )

    rng = jax.random.key(cf.get("seed", 0))
    sample = jnp.zeros((cf["train_bc"],) + img_sz + (1,), jnp.float32)
    state = trainer.init_state(rng, sample, sample)

    # crash recovery (SURVEY.md 5.3; reference parity:
    # pytorch3dunet/unet3d/trainer.py:131-146 can resume, the
    # reference's flagship GAN loop cannot -- a 200-epoch run dying at
    # epoch 150 replays from scratch).  Snapshots live in a STABLE dir
    # keyed by project_dir (NOT the timestamped run dir) so a restarted
    # process finds them; disable with autoresume: false.
    import os
    auto = None
    start_epoch, global_step = 0, 0
    if cf.get("autoresume", True) and not cf.get("is_debug", False):
        resume_dir = cf.get("resume_dir") or os.path.join(
            cf.get("project_dir", "weights"), "autoresume_main_gan_vit")
        auto = AutoResume(os.path.abspath(resume_dir),
                          interval=cf.get("autoresume_interval", 500),
                          keep=cf.get("autoresume_keep", 2))
        like = {"gan": state, "epoch": 0, "rng": rng}
        saved_step, payload = auto.restore_latest(like=like)
        if payload is not None:
            state, rng = payload["gan"], payload["rng"]
            start_epoch = int(payload["epoch"])
            global_step = saved_step
            if multihost.is_main_process():
                print(f"[autoresume] restored step {global_step}, "
                      f"resuming at epoch {start_epoch + 1}")

    # async_ckpt: true -> non-blocking step-indexed saves with retention
    if cf.get("async_ckpt", False):
        ckpt = AsyncCheckpointManager(
            exp.path("model_save"),
            max_to_keep=cf.get("ckpt_keep", 3),
            keep_best=cf.get("ckpt_keep_best", 1))
    else:
        ckpt = Checkpointer(exp.path("model_save"))
    warmup = cf.get("warmup_epochs", 10)
    val_interval, save_interval = cf["val_inter"], cf["save_inter"]
    num_epochs = cf["num_epochs"]

    # non-finite steps are skipped in-jit (gan_trainer guard); the
    # strike counter aborts after N consecutive bad steps.  The skipped
    # flags are polled lazily (flushed at log points) so the guard adds
    # no extra per-step host sync on the ~32 ms-RTT tunnel.
    strikes = StrikeCounter(max_strikes=cf.get("max_strikes", 10))
    pending_skips: list = []

    def flush_strikes():
        while pending_skips:
            strikes.update(float(pending_skips.pop(0)))

    for epoch in range(start_epoch, num_epochs):
        adv_on = jnp.float32(1.0 if (epoch + 1) > warmup else 0.0)
        for step, batch in enumerate(train_loader):
            # local per-process rows -> one globally-sharded batch
            batch = multihost.form_global_array(
                {"image": batch["image"], "label": batch["label"]}, mesh)
            rng, step_rng = jax.random.split(rng)
            state, logs = trainer.train_step(
                state, batch["image"], batch["label"], adv_on, step_rng)
            pending_skips.append(logs["skipped"])
            global_step += 1
            if global_step % cf.get("log_every", 10) == 0:
                flush_strikes()
                if multihost.is_main_process():
                    logs = {k: float(v) for k, v in logs.items()}
                    exp.log_scalars(logs, global_step)
                    print(f"epoch {epoch + 1} step {step}: "
                          + " ".join(f"{k}={v:.4f}"
                                     for k, v in logs.items()))
            if auto is not None:
                auto.maybe_save(global_step,
                                {"gan": state, "epoch": epoch, "rng": rng})
        flush_strikes()
        if auto is not None:
            # end-of-epoch snapshot: a crash mid-epoch N+1 resumes at
            # the start of epoch N+1, never replaying a finished epoch
            auto.maybe_save(global_step,
                            {"gan": state, "epoch": epoch + 1, "rng": rng},
                            force=True)

        do_val = (epoch + 1) % val_interval == 0 or epoch == num_epochs - 1
        do_save = (epoch + 1) % save_interval == 0 or epoch == num_epochs - 1
        # host_local is collective (allgather branch) -> every process
        # enters it; only host-side IO below is gated on process 0
        g_host = multihost.host_local(state.g_params) \
            if (do_val or do_save) else None
        if do_val and multihost.is_main_process():
            for i, batch in enumerate(val_loader):
                recon = trainer.generate(g_host,
                                         jnp.asarray(batch["image"]))
                panel = np.concatenate(
                    [np.asarray(batch["image"]),
                     np.asarray(batch["label"]),
                     np.asarray(recon)], axis=1)
                save_dir = exp.path("results_save", str(epoch + 1))
                import os
                os.makedirs(save_dir, exist_ok=True)
                save_volume_grid(panel, f"{save_dir}/{i + 1}.png")
        if do_save:
            if multihost.is_main_process():
                save_params_npz(exp.path("model_save", "model.npz"),
                                g_host["params"])
            # orbax saves of (possibly) multi-process arrays are
            # collective: every process calls save with the global tree
            tree = {"g_params": state.g_params,
                    "d_params": state.d_params, "epoch": epoch}
            if isinstance(ckpt, AsyncCheckpointManager):
                ckpt.save(epoch + 1, tree)
            else:
                ckpt.save("state", tree)
    if isinstance(ckpt, AsyncCheckpointManager):
        ckpt.close()
    exp.close()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", type=str,
                        default="configs/main_gan_vit_config.yaml")
    main(parser.parse_args())
