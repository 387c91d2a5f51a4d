"""Metrics vs sklearn golden values; GAN/perceptual loss behaviour."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfe_mamba_tpu.training.metrics import (
    binary_metrics, confusion_counts, metrics_from_counts,
)
from gfe_mamba_tpu.losses.gan import patch_adversarial_loss
from gfe_mamba_tpu.models.discriminator import PatchDiscriminator


def test_metrics_match_sklearn():
    sk = pytest.importorskip("sklearn.metrics")
    rng = np.random.RandomState(0)
    targets = rng.randint(0, 2, 64)
    probs = np.clip(targets * 0.6 + rng.rand(64) * 0.5, 0, 1)
    preds = (probs >= 0.5).astype(int)

    m = binary_metrics(jnp.asarray(probs), jnp.asarray(targets))
    np.testing.assert_allclose(float(m.accuracy),
                               sk.accuracy_score(targets, preds), atol=1e-6)
    np.testing.assert_allclose(float(m.precision),
                               sk.precision_score(targets, preds), atol=1e-6)
    np.testing.assert_allclose(float(m.recall),
                               sk.recall_score(targets, preds), atol=1e-6)
    np.testing.assert_allclose(float(m.f1),
                               sk.f1_score(targets, preds), atol=1e-6)
    np.testing.assert_allclose(float(m.mcc),
                               sk.matthews_corrcoef(targets, preds), atol=1e-6)


def test_metrics_streaming_accumulation():
    rng = np.random.RandomState(1)
    targets = rng.randint(0, 2, 40)
    probs = rng.rand(40)
    whole = metrics_from_counts(confusion_counts(jnp.asarray(probs),
                                                 jnp.asarray(targets)))
    c1 = confusion_counts(jnp.asarray(probs[:23]), jnp.asarray(targets[:23]))
    c2 = confusion_counts(jnp.asarray(probs[23:]), jnp.asarray(targets[23:]))
    streamed = metrics_from_counts(c1 + c2)
    for a, b in zip(whole, streamed):
        np.testing.assert_allclose(float(a), float(b), atol=1e-6)


def test_metrics_degenerate_all_negative():
    m = binary_metrics(jnp.zeros(8), jnp.zeros(8))
    assert float(m.accuracy) == 1.0
    assert float(m.precision) == 0.0  # no positive predictions -> 0, not NaN
    assert np.isfinite(float(m.mcc))


def test_lsgan_loss_values():
    logits = jnp.full((2, 3), 0.5)
    # generator wants real: mse(0.5, 1) = 0.25
    g = patch_adversarial_loss(logits, True, False)
    np.testing.assert_allclose(float(g), 0.25, atol=1e-6)
    # discriminator on fake: mse(0.5, 0) = 0.25
    d_fake = patch_adversarial_loss(logits, False, True)
    np.testing.assert_allclose(float(d_fake), 0.25, atol=1e-6)
    # list input averages
    both = patch_adversarial_loss([logits, logits * 0], True, True)
    np.testing.assert_allclose(float(both), (0.25 + 1.0) / 2, atol=1e-6)


def test_patch_discriminator_shapes():
    disc = PatchDiscriminator(num_layers_d=3, num_channels=8)
    x = jnp.ones((1, 32, 32, 16, 1))
    feats = disc.apply(disc.init(jax.random.key(0), x), x)
    assert feats[-1].shape[-1] == 1            # patch logits
    assert len(feats) == 5                     # 3 strided + pre + logits
    # receptive downsampling: 3 stride-2 layers -> /8
    assert feats[2].shape[1] == 4


def test_perceptual_loss_zero_for_identical():
    from gfe_mamba_tpu.losses.perceptual import PerceptualLoss
    loss_fn = PerceptualLoss(fake_3d_ratio=0.5)
    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.rand(1, 32, 32, 8, 1), jnp.float32)
    b = jnp.asarray(rng.rand(1, 32, 32, 8, 1), jnp.float32)
    zero = float(loss_fn(a, a))
    diff = float(loss_fn(a, b))
    assert zero < 1e-10
    assert diff > zero
