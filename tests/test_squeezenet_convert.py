"""SqueezeNet .pth -> npz converter parity (tools/convert_squeezenet.py).

A random torch-format SqueezeNet-1.1 state_dict (saved with torch.save,
exactly what torchvision's ``squeezenet1_1-b8a52dc0.pth`` contains) is
converted and loaded through ``PerceptualLoss(weights_path=...)``; the
flax feature taps must match a from-scratch torch forward of the same
trunk (torchvision source: torchvision/models/squeezenet.py, used by
MONAI PerceptualLoss(network_type='squeeze'), reference
main_gan_vit.py:41).  Proves the key mapping + OIHW->HWIO transform, so
converting the real pretrained file is pure mechanics.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from gfe_mamba_tpu.losses.perceptual import PerceptualLoss  # noqa: E402
from tools.convert_squeezenet import FIRE_INDEX, convert_state_dict  # noqa: E402

FIRE_SPECS = {3: (64, 16, 64), 4: (128, 16, 64), 6: (128, 32, 128),
              7: (256, 32, 128), 9: (256, 48, 192), 10: (384, 48, 192),
              11: (384, 64, 256), 12: (512, 64, 256)}


def _random_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {"features.0.weight": torch.randn(64, 3, 3, 3, generator=g) * 0.2,
          "features.0.bias": torch.randn(64, generator=g) * 0.1}
    for idx, (cin, sq, ex) in FIRE_SPECS.items():
        sd[f"features.{idx}.squeeze.weight"] = (
            torch.randn(sq, cin, 1, 1, generator=g) * 0.2)
        sd[f"features.{idx}.squeeze.bias"] = torch.randn(sq, generator=g) * .1
        sd[f"features.{idx}.expand1x1.weight"] = (
            torch.randn(ex, sq, 1, 1, generator=g) * 0.2)
        sd[f"features.{idx}.expand1x1.bias"] = (
            torch.randn(ex, generator=g) * 0.1)
        sd[f"features.{idx}.expand3x3.weight"] = (
            torch.randn(ex, sq, 3, 3, generator=g) * 0.2)
        sd[f"features.{idx}.expand3x3.bias"] = (
            torch.randn(ex, generator=g) * 0.1)
    return sd


def _torch_features(sd, x):
    """From-scratch torch forward of the SqueezeNet-1.1 trunk with the
    LPIPS tap points (no torchvision import)."""
    import torch.nn.functional as F

    def conv(x, idx_or_key, stride=1, pad=0):
        w, b = sd[f"{idx_or_key}.weight"], sd[f"{idx_or_key}.bias"]
        return F.conv2d(x, w, b, stride=stride, padding=pad)

    def fire(x, idx):
        s = F.relu(conv(x, f"features.{idx}.squeeze"))
        e1 = F.relu(conv(s, f"features.{idx}.expand1x1"))
        e3 = F.relu(conv(s, f"features.{idx}.expand3x3", pad=1))
        return torch.cat([e1, e3], dim=1)

    taps = []
    x = F.relu(conv(x, "features.0", stride=2))
    taps.append(x)
    x = F.max_pool2d(x, 3, stride=2)
    x = fire(fire(x, 3), 4)
    taps.append(x)
    x = F.max_pool2d(x, 3, stride=2)
    x = fire(fire(x, 6), 7)
    taps.append(x)
    x = F.max_pool2d(x, 3, stride=2)
    x = fire(fire(x, 9), 10)
    taps.append(x)
    x = fire(fire(x, 11), 12)
    taps.append(x)
    return taps


def test_converted_weights_feature_parity(tmp_path):
    sd = _random_state_dict()
    pth = tmp_path / "squeezenet1_1.pth"
    torch.save(sd, pth)

    # converter CLI path: torch.load -> convert -> npz
    loaded = torch.load(pth, map_location="cpu", weights_only=True)
    tree = convert_state_dict(loaded)
    npz = tmp_path / "squeeze.npz"
    np.savez(npz, params=np.asarray(tree, dtype=object))

    loss = PerceptualLoss(weights_path=str(npz))
    x = np.random.default_rng(1).normal(size=(2, 65, 65, 3)) \
        .astype(np.float32)
    jax_taps = loss._features(np.asarray(x))
    torch_taps = _torch_features(
        sd, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    assert len(jax_taps) == len(torch_taps) == 5
    for jt, tt in zip(jax_taps, torch_taps):
        tt = tt.permute(0, 2, 3, 1).numpy()
        assert jt.shape == tt.shape, (jt.shape, tt.shape)
        # f32 accumulation-order noise across a deep conv stack at
        # feature magnitudes of ~500
        np.testing.assert_allclose(np.asarray(jt), tt, atol=2e-3, rtol=2e-2)


def test_converted_loss_runs_and_differs_from_seeded(tmp_path):
    sd = _random_state_dict(seed=3)
    tree = convert_state_dict(sd)
    npz = tmp_path / "squeeze.npz"
    np.savez(npz, params=np.asarray(tree, dtype=object))
    import jax.numpy as jnp
    vol_a = jnp.ones((1, 32, 32, 8, 1)) * 0.3
    vol_b = jnp.linspace(0, 1, 32 * 32 * 8).reshape(1, 32, 32, 8, 1)
    pretrained = PerceptualLoss(weights_path=str(npz))
    seeded = PerceptualLoss()
    lp = float(pretrained(vol_a, vol_b))
    ls = float(seeded(vol_a, vol_b))
    assert np.isfinite(lp) and lp > 0
    assert abs(lp - ls) > 1e-6  # really using the converted weights
    assert float(pretrained(vol_b, vol_b)) < 1e-6
