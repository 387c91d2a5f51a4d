"""Kill-and-restart resilience of the Stage-1 CLI (VERDICT r3 weak #6).

The flagship GAN loop must survive a hard kill: a restarted
``main_gan_vit.py`` run with the same config restores the newest
AutoResume snapshot (epoch + generator/discriminator params + both
optimizer states + the RNG stream) and resumes at the right epoch
instead of replaying from scratch -- the capability the reference's
vendored trainer has (pytorch3dunet/unet3d/trainer.py:131-146) but its
flagship loop lacks (a crash at epoch 150/200 restarts at 0).
"""

import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = """
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import argparse
import main_gan_vit
main_gan_vit.main(argparse.Namespace(config_path={config!r}))
print("RUN-COMPLETE")
"""

_CONFIG = """
train_path: {train}
eval_path: {eval}
train_bc: 2
eval_bc: 1
img_sz: [16, 16, 8]
num_epochs: 3
val_inter: 50
save_inter: 50
log_every: 1
warmup_epochs: 10
mixed_precision: none
remat: false
f_maps: [4, 8]
fold_factor: 2
vit_patch_size: 4
vit_dim: 16
vit_depth: 1
vit_heads: 2
vit_mlp_dim: 32
num_workers: 0
project_dir: {proj}
autoresume_interval: 100
seed: 0
"""


def test_gan_cli_kill_and_restart_resumes_at_right_epoch(tmp_path):
    from gfe_mamba_tpu.data.synthetic import make_mri2pet_tree

    train = make_mri2pet_tree(str(tmp_path / "train"), n_subjects=4,
                              shape=(16, 16, 8))
    evald = make_mri2pet_tree(str(tmp_path / "eval"), n_subjects=1,
                              shape=(16, 16, 8), seed=1)
    proj = str(tmp_path / "weights")
    config = tmp_path / "gan.yaml"
    config.write_text(_CONFIG.format(train=train, eval=evald, proj=proj))
    script = tmp_path / "run.py"
    script.write_text(_RUNNER.format(repo=REPO, config=str(config)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}

    # phase 1: run until epoch 2 starts (epoch 1's forced end-of-epoch
    # snapshot is on disk by then), then SIGKILL mid-epoch
    p = subprocess.Popen([sys.executable, "-u", str(script)],
                         stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True, env=env)
    lines, deadline = [], time.time() + 540
    try:
        while time.time() < deadline:
            line = p.stdout.readline()
            if not line:
                break
            lines.append(line)
            if line.startswith("epoch 2 step"):
                break
        else:
            raise AssertionError("timed out waiting for epoch 2:\n"
                                 + "".join(lines))
        assert any(l.startswith("epoch 2 step") for l in lines), \
            "".join(lines)
        os.kill(p.pid, signal.SIGKILL)
    finally:
        p.kill()
        p.wait(timeout=30)

    snap_dir = os.path.join(proj, "autoresume_main_gan_vit")
    assert os.path.isdir(snap_dir), "no autoresume snapshots written"

    # phase 2: same config, fresh process -> must resume at epoch 2,
    # never replay epoch 1, and run to completion
    out = subprocess.run([sys.executable, "-u", str(script)],
                         capture_output=True, text=True, env=env,
                         timeout=540)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "[autoresume] restored" in out.stdout, out.stdout
    assert "resuming at epoch 2" in out.stdout, out.stdout
    assert not any(l.startswith("epoch 1 step")
                   for l in out.stdout.splitlines()), out.stdout
    assert "epoch 3 step" in out.stdout, out.stdout
    assert "RUN-COMPLETE" in out.stdout, out.stdout
