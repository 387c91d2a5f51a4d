"""Trainer + checkpoint tests: GAN fused step, classifier masked-freeze
step, optimizer clip transforms, checkpoint roundtrips, loader sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gfe_mamba_tpu.losses.perceptual import PerceptualLoss
from gfe_mamba_tpu.models.discriminator import PatchDiscriminator
from gfe_mamba_tpu.models.pipeline import build_gfe_mamba
from gfe_mamba_tpu.models.unet3d import ResidualMidUNet3DViT
from gfe_mamba_tpu.training.checkpoint import (
    BestTracker, load_params_npz, save_params_npz,
)
from gfe_mamba_tpu.training.classify_trainer import ClassifyTrainer
from gfe_mamba_tpu.training.gan_trainer import GanTrainer
from gfe_mamba_tpu.training.optim import clip_by_param_norm, cast_for_compute

TINY_GEN = dict(f_maps=(4, 8, 16), layer_order="cge", fold_factor=2,
                vit_patch_size=4, vit_dim=16, vit_depth=1, vit_heads=2,
                vit_mlp_dim=32)


def test_clip_by_param_norm():
    tx = clip_by_param_norm(1.0)
    grads = {"a": jnp.full((4,), 10.0), "b": jnp.full((2,), 0.1)}
    updates, _ = tx.update(grads, tx.init(None))
    # each tensor clipped to norm 1 independently
    np.testing.assert_allclose(float(jnp.linalg.norm(updates["a"])), 1.0,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(updates["b"]),
                               np.asarray(grads["b"]))


def test_cast_for_compute():
    tree = {"w": jnp.ones(3, jnp.float32), "i": jnp.ones(3, jnp.int32)}
    out = cast_for_compute(tree)
    assert out["w"].dtype == jnp.bfloat16
    assert out["i"].dtype == jnp.int32


def test_gan_trainer_step_updates_and_warmup_gate():
    gen = ResidualMidUNet3DViT(1, 1, is_segmentation=False, **TINY_GEN)
    disc = PatchDiscriminator(num_layers_d=2, num_channels=4)
    trainer = GanTrainer(gen, disc, PerceptualLoss(fake_3d_ratio=0.5),
                         mixed_precision="none")
    rng = jax.random.key(0)
    mri = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 8, 1),
                      jnp.float32)
    pet = jnp.asarray(np.random.RandomState(1).randn(1, 16, 16, 8, 1),
                      jnp.float32)
    state = trainer.init_state(rng, mri, pet)
    d0 = jax.tree_util.tree_leaves(state.d_params)[0].copy()
    opt0 = [np.asarray(l).copy()
            for l in jax.tree_util.tree_leaves(state.d_opt)]

    # warm-up: adv gate 0 -> discriminator must NOT move
    state1, logs = trainer.train_step(state, mri, pet, jnp.float32(0.0), rng)
    assert np.isfinite(float(logs["g_loss"]))
    # train_step donates its input state; materialize before the next call
    d1 = np.asarray(jax.tree_util.tree_leaves(state1.d_params)[0])
    np.testing.assert_allclose(np.asarray(d0), d1)
    # ... and neither must its optimizer state: the reference skips
    # opt_d.step() entirely in warm-up (main_gan_vit.py:84-97), and an
    # advancing Adam count would de-amplify the bias correction of the
    # first real post-warm-up updates
    opt1 = [np.asarray(l) for l in jax.tree_util.tree_leaves(state1.d_opt)]
    for before, after in zip(opt0, opt1):
        np.testing.assert_allclose(before, after)

    # post warm-up: both nets move
    state2, logs2 = trainer.train_step(state1, mri, pet, jnp.float32(1.0),
                                       rng)
    d2 = np.asarray(jax.tree_util.tree_leaves(state2.d_params)[0])
    assert not np.allclose(d1, d2)
    assert float(logs2["d_loss"]) > 0


def test_stage2_stop_gradient():
    """train_step's stop_gradient on the generator subtree is exactly
    the masked-update semantics: trainable-param grads are unchanged
    vs differentiating through the generator, and generator grads are
    exact zeros (the reference's torch.no_grad() generator forward,
    classify_mamba.py:100)."""
    model = build_gfe_mamba(categories=(3, 2), num_continuous=3, dim=32,
                            depth=1, heads=2, seq_length=2, **TINY_GEN)
    trainer = ClassifyTrainer(model, mixed_precision="none")
    rng = jax.random.key(1)
    mri = jnp.asarray(np.random.RandomState(3).randn(2, 16, 16, 8, 1),
                      jnp.float32)
    x_cat = jnp.zeros((2, 2), jnp.int32)
    x_num = jnp.ones((2, 3), jnp.float32)
    y = jnp.asarray([1.0, 0.0])
    state = trainer.init_state(rng, mri, x_cat, x_num)
    p0 = state.params["params"]

    def loss_raw(p):
        return trainer._loss({**state.params, "params": p}, mri, x_cat,
                             x_num, y, rng)[0]

    def loss_stop(p):
        p = {**p, "generator": jax.lax.stop_gradient(p["generator"])}
        return loss_raw(p)

    g_raw = jax.grad(loss_raw)(p0)
    g_stop = jax.grad(loss_stop)(p0)
    for leaf in jax.tree_util.tree_leaves(g_stop["generator"]):
        assert float(jnp.max(jnp.abs(leaf))) == 0.0
    for k in p0:
        if k == "generator":
            continue
        for a, b in zip(jax.tree_util.tree_leaves(g_raw[k]),
                        jax.tree_util.tree_leaves(g_stop[k])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)


def test_classify_trainer_freezes_generator():
    model = build_gfe_mamba(categories=(3, 2), num_continuous=3, dim=32,
                            depth=1, heads=2, seq_length=2, **TINY_GEN)
    trainer = ClassifyTrainer(model, mixed_precision="none")
    rng = jax.random.key(0)
    mri = jnp.asarray(np.random.RandomState(2).randn(2, 16, 16, 8, 1),
                      jnp.float32)
    x_cat = jnp.zeros((2, 2), jnp.int32)
    x_num = jnp.ones((2, 3), jnp.float32)
    y = jnp.asarray([0.0, 1.0])
    state = trainer.init_state(rng, mri, x_cat, x_num)
    gen_before = jax.tree_util.tree_map(
        lambda a: a.copy(), state.params["params"]["generator"])
    cls_before = state.params["params"]["classifier"]["to_logits"][
        "Dense_0"]["kernel"].copy()

    state, logs = trainer.train_step(state, mri, x_cat, x_num, y, rng)
    assert np.isfinite(float(logs["cla_loss"]))
    # generator frozen
    for a, b in zip(jax.tree_util.tree_leaves(gen_before),
                    jax.tree_util.tree_leaves(
                        state.params["params"]["generator"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # classifier trained
    assert not np.allclose(
        np.asarray(cls_before),
        np.asarray(state.params["params"]["classifier"]["to_logits"][
            "Dense_0"]["kernel"]))

    # eval step produces probabilities + counts
    probs, loss, counts = trainer.eval_step(state.params, mri, x_cat,
                                            x_num, y)
    assert probs.shape == (2,)
    assert float(counts.tp + counts.fp + counts.tn + counts.fn) == 2.0


def test_params_npz_roundtrip(tmp_path):
    params = {"layer": {"kernel": jnp.arange(6.0).reshape(2, 3),
                        "bias": jnp.ones(3)}}
    path = str(tmp_path / "w.npz")
    save_params_npz(path, params)
    like = jax.tree_util.tree_map(jnp.zeros_like, params)
    restored = load_params_npz(path, like)
    np.testing.assert_allclose(np.asarray(restored["layer"]["kernel"]),
                               np.asarray(params["layer"]["kernel"]))
    # shape mismatch rejected
    bad = {"layer": {"kernel": jnp.zeros((3, 2)), "bias": jnp.ones(3)}}
    with pytest.raises(ValueError):
        load_params_npz(path, bad)


def test_best_tracker():
    t = BestTracker()
    assert t.is_better(80.0, 0.5)
    assert not t.is_better(79.0, 0.1)
    assert t.is_better(80.0, 0.4)   # tie on acc, better loss
    assert t.is_better(81.0, 0.9)


def test_finite_guard_skips_bad_steps():
    from gfe_mamba_tpu.training.resilience import finite_guard

    def step(state, x):
        loss = jnp.sum(state["w"] * x)
        return {"w": state["w"] + x}, {"cla_loss": loss}

    guarded, strikes = finite_guard(step, max_strikes=2)
    state = {"w": jnp.ones(3)}
    state, logs = guarded(state, jnp.ones(3))
    assert float(logs["skipped"]) == 0.0
    np.testing.assert_allclose(np.asarray(state["w"]), 2.0)
    # a NaN batch must leave the state untouched
    state, logs = guarded(state, jnp.asarray([jnp.nan, 1.0, 1.0]))
    assert float(logs["skipped"]) == 1.0
    np.testing.assert_allclose(np.asarray(state["w"]), 2.0)
    strikes.update(1.0)
    with pytest.raises(FloatingPointError):
        strikes.update(1.0)


def test_auto_resume_roundtrip(tmp_path):
    from gfe_mamba_tpu.training.resilience import AutoResume
    ar = AutoResume(str(tmp_path), interval=10, keep=2)
    state = {"w": jnp.arange(4.0)}
    assert not ar.maybe_save(5, state)
    assert ar.maybe_save(10, state)
    assert ar.maybe_save(20, {"w": jnp.arange(4.0) * 2})
    step, restored = ar.restore_latest(like=state)
    assert step == 20
    np.testing.assert_allclose(np.asarray(restored["w"]),
                               np.arange(4.0) * 2)


def test_gan_trainer_gradient_accumulation():
    """accum=2 must equal a single full-batch step for BOTH optimizers
    (the reference accumulates G and D across microbatches,
    main_gan_vit.py:68-97).  Dropout off so rng splitting is inert."""
    cfg = dict(TINY_GEN, dropout_prob=0.0, vit_dropout=0.0,
               vit_emb_dropout=0.0)
    mri = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 8, 1),
                      jnp.float32)
    pet = jnp.asarray(np.random.RandomState(1).randn(2, 16, 16, 8, 1),
                      jnp.float32)
    rng = jax.random.key(0)
    states = []
    for accum in (1, 2):
        gen = ResidualMidUNet3DViT(1, 1, is_segmentation=False, **cfg)
        disc = PatchDiscriminator(num_layers_d=2, num_channels=4)
        trainer = GanTrainer(gen, disc, PerceptualLoss(fake_3d_ratio=0.5),
                             mixed_precision="none", accum_steps=accum)
        state = trainer.init_state(rng, mri[:1], pet[:1])
        state, logs = trainer.train_step(state, mri, pet,
                                         jnp.float32(1.0), rng)
        for key, value in logs.items():
            assert np.isfinite(float(value)), key
        states.append(state)
    for a, b in zip(jax.tree_util.tree_leaves(states[0].g_params),
                    jax.tree_util.tree_leaves(states[1].g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(states[0].d_params),
                    jax.tree_util.tree_leaves(states[1].d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_resample_torch_init_laws():
    """kernels -> U(+-sqrt(1/fan_in)), sibling biases ->
    U(+-1/sqrt(fan_in)), norm affine untouched (torch Linear/ConvNd
    reset_parameters laws; utils/initializers.py)."""
    from gfe_mamba_tpu.utils.initializers import resample_torch_init
    params = {
        "conv": {"kernel": jnp.ones((3, 3, 3, 16, 8)),
                 "bias": jnp.ones((8,))},
        "dense": {"kernel": jnp.ones((256, 64)), "bias": jnp.ones((64,))},
        "norm": {"scale": jnp.ones((16,)), "bias": jnp.zeros((16,))},
        "cls_token": jnp.full((1, 1, 8), 3.0),
    }
    out = resample_torch_init(params, jax.random.key(0))
    for name, fan_in in (("conv", 3 * 3 * 3 * 16), ("dense", 256)):
        k = np.asarray(out[name]["kernel"])
        bound = np.sqrt(1.0 / fan_in)
        assert np.abs(k).max() <= bound and np.abs(k).max() > 0.8 * bound
        assert abs(k.mean()) < 0.2 * bound
        b = np.asarray(out[name]["bias"])
        bb = 1.0 / np.sqrt(fan_in)
        assert np.abs(b).max() <= bb
        assert not np.allclose(b, 1.0)
    np.testing.assert_allclose(np.asarray(out["norm"]["scale"]), 1.0)
    np.testing.assert_allclose(np.asarray(out["norm"]["bias"]), 0.0)
    np.testing.assert_allclose(np.asarray(out["cls_token"]), 3.0)


def test_gan_trainer_torch_init_default():
    """GanTrainer defaults to torch-law generator init; g_init='flax'
    keeps the flax init; the discriminator keeps its DCGAN init."""
    gen = ResidualMidUNet3DViT(1, 1, is_segmentation=False, **TINY_GEN)
    disc = PatchDiscriminator(num_layers_d=2, num_channels=4)
    mri = jnp.zeros((1, 16, 16, 8, 1), jnp.float32)
    rng = jax.random.key(0)
    states = {}
    for style in ("torch", "flax"):
        trainer = GanTrainer(gen, disc, PerceptualLoss(fake_3d_ratio=0.5),
                             mixed_precision="none", g_init=style)
        states[style] = trainer.init_state(rng, mri, mri)
    g_t = jax.tree_util.tree_leaves(states["torch"].g_params)
    g_f = jax.tree_util.tree_leaves(states["flax"].g_params)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(g_t, g_f))
    # discriminators identical (resampling is generator-only; the D has
    # MONAI's DCGAN init already)
    for a, b in zip(jax.tree_util.tree_leaves(states["torch"].d_params),
                    jax.tree_util.tree_leaves(states["flax"].d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    import pytest
    with pytest.raises(ValueError):
        GanTrainer(gen, disc, PerceptualLoss(fake_3d_ratio=0.5),
                   g_init="bogus")


def test_gan_trainer_d_fresh_recon():
    """d_fresh_recon=True: D trains against a post-update generator
    forward (main_gan_vit.py:86-88 semantics).  With dropout off, the
    D update must DIFFER from the shared-forward mode (the critic sees
    the updated generator), while the G update is identical."""
    cfg = dict(TINY_GEN, dropout_prob=0.0, vit_dropout=0.0,
               vit_emb_dropout=0.0)
    mri = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 8, 1),
                      jnp.float32)
    pet = jnp.asarray(np.random.RandomState(1).randn(1, 16, 16, 8, 1),
                      jnp.float32)
    rng = jax.random.key(0)
    states = []
    for fresh in (False, True):
        gen = ResidualMidUNet3DViT(1, 1, is_segmentation=False, **cfg)
        disc = PatchDiscriminator(num_layers_d=2, num_channels=4)
        trainer = GanTrainer(gen, disc, PerceptualLoss(fake_3d_ratio=0.5),
                             mixed_precision="none", d_fresh_recon=fresh)
        state = trainer.init_state(rng, mri, pet)
        state, logs = trainer.train_step(state, mri, pet,
                                         jnp.float32(1.0), rng)
        assert np.isfinite(float(logs["d_loss"]))
        states.append(state)
    for a, b in zip(jax.tree_util.tree_leaves(states[0].g_params),
                    jax.tree_util.tree_leaves(states[1].g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    d_diff = any(
        not np.allclose(np.asarray(a), np.asarray(b), atol=1e-8)
        for a, b in zip(jax.tree_util.tree_leaves(states[0].d_params),
                        jax.tree_util.tree_leaves(states[1].d_params)))
    assert d_diff

    import pytest
    with pytest.raises(ValueError):
        GanTrainer(gen, disc, PerceptualLoss(fake_3d_ratio=0.5),
                   accum_steps=2, d_fresh_recon=True)


def test_classify_trainer_restore_without_init():
    """The optimizer is built in __init__, so a fresh trainer can resume
    from checkpointed params without ever calling init_state."""
    model = build_gfe_mamba(categories=(3, 2), num_continuous=3, dim=32,
                            depth=1, heads=2, seq_length=2, **TINY_GEN)
    rng = jax.random.key(0)
    mri = jnp.zeros((1, 16, 16, 8, 1), jnp.float32)
    x_cat = jnp.zeros((1, 2), jnp.int32)
    x_num = jnp.zeros((1, 3), jnp.float32)
    params = ClassifyTrainer(model).pipeline.init(rng, mri, x_cat, x_num)

    from gfe_mamba_tpu.training.classify_trainer import ClassifyState
    fresh = ClassifyTrainer(model, lr=1e-3, mixed_precision="none")
    state = ClassifyState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=fresh.tx.init(params["params"]))
    state, logs = fresh.train_step(state, mri, x_cat, x_num,
                                   jnp.zeros((1,), jnp.float32), rng)
    assert np.isfinite(float(logs["cla_loss"]))
    assert int(state.step) == 1


def test_pipeline_overfits_tiny_cohort():
    """Integration: the full Stage-2 train step drives loss down on a
    4-sample synthetic cohort with a learnable signal."""
    model = build_gfe_mamba(categories=(3, 2), num_continuous=3, dim=32,
                            depth=1, heads=2, seq_length=2, **TINY_GEN)
    trainer = ClassifyTrainer(model, lr=3e-3, mixed_precision="none")
    rng = jax.random.key(0)
    gen = np.random.RandomState(0)
    labels = np.asarray([0.0, 1.0, 0.0, 1.0], np.float32)
    # label leaks through a numeric feature AND the volume intensity
    mri = gen.randn(4, 16, 16, 8, 1).astype(np.float32) + labels.reshape(
        4, 1, 1, 1, 1)
    x_num = np.concatenate(
        [labels[:, None] * 2 - 1, gen.randn(4, 2).astype(np.float32)], 1)
    x_cat = np.zeros((4, 2), np.int32)

    state = trainer.init_state(rng, jnp.asarray(mri), jnp.asarray(x_cat),
                               jnp.asarray(x_num))
    first_loss = None
    for step in range(30):
        rng, sub = jax.random.split(rng)
        state, logs = trainer.train_step(
            state, jnp.asarray(mri), jnp.asarray(x_cat),
            jnp.asarray(x_num), jnp.asarray(labels), sub)
        if first_loss is None:
            first_loss = float(logs["cla_loss"])
    final_loss = float(logs["cla_loss"])
    assert final_loss < 0.6 * first_loss, (first_loss, final_loss)
    probs, _, counts = trainer.eval_step(
        state.params, jnp.asarray(mri), jnp.asarray(x_cat),
        jnp.asarray(x_num), jnp.asarray(labels))
    from gfe_mamba_tpu.training.metrics import metrics_from_counts
    assert float(metrics_from_counts(counts).accuracy) == 1.0


def test_async_checkpoint_manager_retention(tmp_path):
    """Async saves + max_to_keep GC + best-k retention + restore
    (training/checkpoint.py AsyncCheckpointManager)."""
    import jax.numpy as jnp
    from gfe_mamba_tpu.training.checkpoint import AsyncCheckpointManager

    mgr = AsyncCheckpointManager(str(tmp_path / "ck"), max_to_keep=2,
                                 keep_best=1)
    metrics = {1: 0.5, 2: 0.9, 3: 0.4, 4: 0.6, 5: 0.7}
    for step, acc in metrics.items():
        tree = {"w": jnp.full((4,), float(step)), "step": jnp.int32(step)}
        mgr.save(step, tree, metric=acc)
    mgr.wait()
    mgr._gc()
    kept = mgr.steps()
    # last 2 steps + the best (step 2, acc 0.9)
    assert set(kept) == {2, 4, 5}, kept
    assert mgr.best_step() == 2
    assert mgr.latest_step() == 5
    like = {"w": jnp.zeros((4,)), "step": jnp.int32(0)}
    best = mgr.restore(2, like=like)
    np.testing.assert_allclose(np.asarray(best["w"]), 2.0)

    # a fresh manager over the same dir recovers the metric index
    mgr.close()
    mgr2 = AsyncCheckpointManager(str(tmp_path / "ck"), max_to_keep=2,
                                  keep_best=1)
    assert mgr2.best_step() == 2
    mgr2.close()
