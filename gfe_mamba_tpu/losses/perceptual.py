"""Perceptual (LPIPS-style) loss with 2.5D slicing for 3D volumes.

Fills the role of MONAI ``PerceptualLoss(spatial_dims=3,
network_type="squeeze", fake_3d_ratio=0.25)`` (main_gan_vit.py:41):
sample a fraction of 2D slices along each of the three axes, push both
volumes' slices through a frozen SqueezeNet-style feature pyramid,
compare channel-normalized features (squared distance, spatial mean,
layer sum), and average over the three axes.

Weights: this environment has no torchvision/pretrained checkpoints and
no network egress, so the feature net initializes from a FIXED seed --
random multi-scale conv features are a known-usable perceptual metric
(random-weight LPIPS correlates with human judgments far above pixel
losses).  If a converted checkpoint is placed at ``weights_path``
(npz of this module's param pytree), it is loaded instead; parity with
torch-LPIPS numbers can be restored in a later round by converting the
torchvision SqueezeNet1.1 weights offline.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import freeze

Array = jax.Array


class Fire(nn.Module):
    """SqueezeNet fire module: squeeze 1x1 -> expand 1x1 + 3x3 concat."""

    squeeze: int
    expand: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        s = jax.nn.relu(nn.Conv(self.squeeze, (1, 1), name="squeeze")(x))
        e1 = jax.nn.relu(nn.Conv(self.expand, (1, 1), name="expand1x1")(s))
        e3 = jax.nn.relu(nn.Conv(self.expand, (3, 3), padding="SAME",
                                 name="expand3x3")(s))
        return jnp.concatenate([e1, e3], axis=-1)


class SqueezeFeatures(nn.Module):
    """SqueezeNet-1.1 trunk emitting the LPIPS 'squeeze' feature taps."""

    @nn.compact
    def __call__(self, x: Array) -> list[Array]:
        taps = []
        # torchvision SqueezeNet-1.1 conv1 is UNpadded (Conv2d(3, 64, 3,
        # stride=2)); flax defaults to SAME -- use VALID for parity with
        # converted checkpoints (tools/convert_squeezenet.py)
        x = jax.nn.relu(nn.Conv(64, (3, 3), strides=(2, 2),
                                padding="VALID", name="conv1")(x))
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = Fire(16, 64, name="fire1")(x)
        x = Fire(16, 64, name="fire2")(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = Fire(32, 128, name="fire3")(x)
        x = Fire(32, 128, name="fire4")(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = Fire(48, 192, name="fire5")(x)
        x = Fire(48, 192, name="fire6")(x)
        taps.append(x)
        x = Fire(64, 256, name="fire7")(x)
        x = Fire(64, 256, name="fire8")(x)
        taps.append(x)
        return taps


def _normalize_channels(feat: Array, eps: float = 1e-10) -> Array:
    norm = jnp.sqrt(jnp.sum(feat ** 2, axis=-1, keepdims=True))
    return feat / (norm + eps)


class PerceptualLoss:
    """Callable ``loss = PerceptualLoss()(pred, target)`` over
    channels-last 3D volumes (B, H, W, D, C).

    fake_3d_ratio: fraction of slices sampled per axis
    (MONAI fake_3d_ratio=0.25, main_gan_vit.py:41).  Slice picks are
    deterministic (evenly strided) so the loss is a pure function --
    the stochastic subset of the reference only reduces variance, not
    the expectation.
    """

    def __init__(self, fake_3d_ratio: float = 0.25, seed: int = 0,
                 weights_path: str | None = None):
        self.fake_3d_ratio = fake_3d_ratio
        self.net = SqueezeFeatures()
        if weights_path:
            loaded = dict(np.load(weights_path, allow_pickle=True))
            self.params = freeze(jax.tree_util.tree_map(
                jnp.asarray, loaded["params"].item()))
        else:
            dummy = jnp.zeros((1, 64, 64, 3))
            self.params = self.net.init(jax.random.key(seed), dummy)

    def _features(self, img2d: Array) -> list[Array]:
        # 1-channel medical slices -> 3 channels (MONAI does the same)
        if img2d.shape[-1] == 1:
            img2d = jnp.repeat(img2d, 3, axis=-1)
        return self.net.apply(self.params, img2d)

    def _lpips_2d(self, pred: Array, target: Array) -> Array:
        # the squeeze trunk needs >=32px inputs (three stride-2 pools);
        # upsample smaller slices (only relevant for toy volumes)
        h, w = pred.shape[1:3]
        if min(h, w) < 32:
            scale = 32 / min(h, w)
            new = (pred.shape[0], max(32, int(h * scale)),
                   max(32, int(w * scale)), pred.shape[-1])
            pred = jax.image.resize(pred, new, method="linear")
            target = jax.image.resize(target, new, method="linear")
        f_pred = self._features(pred)
        f_tgt = self._features(target)
        total = 0.0
        for a, b in zip(f_pred, f_tgt):
            diff = (_normalize_channels(a) - _normalize_channels(b)) ** 2
            total = total + jnp.mean(jnp.sum(diff, axis=-1))
        return total

    def _slices(self, vol: Array, axis: int) -> Array:
        """Evenly strided 2D slices along spatial ``axis`` -> a batch of
        (h, w, C) images."""
        spatial_axis = axis + 1  # skip batch
        n = vol.shape[spatial_axis]
        take = max(1, int(n * self.fake_3d_ratio))
        idx = jnp.linspace(0, n - 1, take).astype(jnp.int32)
        sl = jnp.take(vol, idx, axis=spatial_axis)
        sl = jnp.moveaxis(sl, spatial_axis, 1)        # (B, take, h, w, C)
        return sl.reshape((-1,) + sl.shape[2:])

    def __call__(self, pred: Array, target: Array) -> Array:
        assert pred.ndim == 5, "expected (B, H, W, D, C) volumes"
        total = 0.0
        for axis in range(3):
            total = total + self._lpips_2d(self._slices(pred, axis),
                                           self._slices(target, axis))
        return total / 3.0
