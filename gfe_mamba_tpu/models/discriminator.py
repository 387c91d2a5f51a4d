"""3D PatchGAN discriminator.

Fills the role of MONAI ``PatchDiscriminator(spatial_dims=3,
num_layers_d=3, num_channels=32, in_channels=1, out_channels=1,
kernel_size=4, padding=1)`` in the Stage-1 GAN (main_gan_vit.py:33-40):
a pix2pix-style patch classifier over 3D volumes.

Structure (standard 70x70-PatchGAN generalized to 3D):
  conv(k4,s2) + LeakyReLU(0.2)                      [no norm]
  x (num_layers_d - 1): conv(k4,s2) + Norm + LeakyReLU(0.2)
  conv(k4,s1) + Norm + LeakyReLU(0.2)               [channel x2]
  conv(k4,s1) -> out_channels patch logits

``__call__`` returns the list of intermediate features with the final
patch logits LAST, preserving the reference's ``discriminator(x)[-1]``
access pattern (main_gan_vit.py:75,88,90).  Instance norm (GroupNorm
with one channel per group) replaces batch norm: batch-size-1 GAN
training (the reference's config) makes batch statistics degenerate,
and instance norm jits cleanly with no mutable state.

Initialization follows MONAI's ``initialise_weights`` DCGAN convention
(convs ~ N(0, 0.02), norm scale ~ N(1, 0.02)): the GAN equilibrium is
sensitive to the discriminator's initial logit scale, and flax's
default lecun_normal starts the critic in a measurably different
regime than the reference's.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen.dtypes import promote_dtype

from gfe_mamba_tpu.ops.conv4 import can_use_s2d, conv_k4s2_s2d

Array = jax.Array


def _dcgan_norm_scale(key, shape, dtype=jnp.float32):
    """MONAI initialise_weights: norm weight ~ N(1.0, 0.02)."""
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


class _S2DConv(nn.Module):
    """k4 s2 pad(1,1) conv evaluated via ops.conv4.conv_k4s2_s2d.

    Param tree ("kernel"/"bias", HWDIO shape) and init stream are
    byte-identical to the ``nn.Conv`` it replaces, so checkpoints and
    drawn initializations are unchanged -- only the lowering differs.
    """

    features: int
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = \
        nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: Array) -> Array:
        C = x.shape[-1]
        w = self.param("kernel", self.kernel_init,
                       (4, 4, 4, C, self.features))
        b = (self.param("bias", nn.initializers.zeros, (self.features,))
             if self.use_bias else None)
        x, w, b = promote_dtype(x, w, b, dtype=None)
        return conv_k4s2_s2d(x, w, b)


class PatchDiscriminator(nn.Module):
    num_layers_d: int = 3
    num_channels: int = 32
    out_channels: int = 1
    kernel_size: int = 4
    dims: int = 3
    dcgan_init: bool = True
    # Lower the stride-2 convs via space-to-depth (ops/conv4.py):
    # numerically identical, same param tree; falls back to nn.Conv
    # per-layer when the geometry isn't the canonical even/pad-(1,1)
    # case.  Default off until the on-chip Stage-1 A/B.
    s2d: bool = False

    @staticmethod
    def _padding(x: Array, kernel: int) -> list[tuple[int, int]]:
        """Base (1,1) padding, widened per-dim so every conv output has
        at least one sample even on toy-sized volumes (torch would raise
        there; the canonical 160x160x96 path keeps the exact pix2pix
        (1,1) padding)."""
        pads = []
        for n in x.shape[1:-1]:
            lo = 1
            hi = max(1, kernel - n - lo)
            pads.append((lo, hi))
        return pads

    @nn.compact
    def __call__(self, x: Array) -> list[Array]:
        k = (self.kernel_size,) * self.dims
        s2 = (2,) * self.dims
        s1 = (1,) * self.dims
        features = []
        conv_kw = {}
        norm_kw = {}
        if self.dcgan_init:
            conv_kw["kernel_init"] = nn.initializers.normal(0.02)
            norm_kw["scale_init"] = _dcgan_norm_scale

        def conv_s2(x, ch, name, use_bias=True):
            pad = self._padding(x, self.kernel_size)
            if (self.s2d and self.dims == 3
                    and can_use_s2d(x.shape, self.kernel_size, s2, pad)):
                # _S2DConv only understands kernel_init; fail loudly if
                # conv_kw ever grows a key it would silently drop (it
                # must stay interchangeable with the nn.Conv path).
                extra = set(conv_kw) - {"kernel_init"}
                if extra:
                    raise NotImplementedError(
                        f"_S2DConv path does not forward conv_kw keys "
                        f"{sorted(extra)}; extend _S2DConv or set "
                        f"s2d=False")
                ki = conv_kw.get("kernel_init",
                                 nn.initializers.lecun_normal())
                return _S2DConv(ch, use_bias=use_bias, kernel_init=ki,
                                name=name)(x)
            return nn.Conv(ch, k, strides=s2, padding=pad,
                           use_bias=use_bias, name=name, **conv_kw)(x)

        ch = self.num_channels
        x = conv_s2(x, ch, "conv_0")
        x = jax.nn.leaky_relu(x, 0.2)
        features.append(x)

        for i in range(1, self.num_layers_d):
            ch *= 2
            x = conv_s2(x, ch, f"conv_{i}", use_bias=False)
            x = nn.GroupNorm(num_groups=None, group_size=1,
                             name=f"norm_{i}", **norm_kw)(x)
            x = jax.nn.leaky_relu(x, 0.2)
            features.append(x)

        ch *= 2
        x = nn.Conv(ch, k, strides=s1,
                    padding=self._padding(x, self.kernel_size),
                    use_bias=False, name="conv_pre", **conv_kw)(x)
        x = nn.GroupNorm(num_groups=None, group_size=1, name="norm_pre",
                         **norm_kw)(x)
        x = jax.nn.leaky_relu(x, 0.2)
        features.append(x)

        logits = nn.Conv(self.out_channels, k, strides=s1,
                         padding=self._padding(x, self.kernel_size),
                         name="conv_out", **conv_kw)(x)
        features.append(logits)
        return features
