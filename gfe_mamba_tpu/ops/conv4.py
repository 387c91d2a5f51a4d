"""Space-to-depth form of the PatchGAN's k=4 stride-2 conv.

The Stage-1 discriminator (MONAI ``PatchDiscriminator`` in the
reference, /root/reference/main_gan_vit.py:33-40) is a stack of
kernel-4 stride-2 convolutions with 1..64 channels.  On TPU those are
a poor fit as written: the first layer has ONE input channel (the MXU
sees a 128-wide lane with 1 live element) and every layer's window
overlap makes XLA materialize strided gather patterns.  The classical
TPU fix (used by MLPerf ResNet stems) applies verbatim because
kernel = 2 x stride: pad by (1, 1), space-to-depth by 2 in each
spatial dim, and the k4s2 conv becomes an EXACTLY equivalent k2s1
VALID conv over 8C lane-packed channels:

    out[o] = sum_{t=0..3} x_pad[2o + t] w[t]          (per dim)
    y[p]   = (x_pad[2p], x_pad[2p+1])                 (s2d pairs)
    out[o] = sum_{u=0,1} (y[o][u] w[u] + y[o+1][u] w[2+u])

i.e. a kernel-2 conv over ``y`` whose input channels enumerate the
(2x2x2 offset, C) pairs.  FLOPs are identical (4^3 C = 2^3 8C); the
input layout becomes lane-full from layer 2 on (8*32 = 256 channels),
and the weight rearrangement is a pure transpose of the SAME
(4,4,4,C,F) parameter -- checkpoints and param trees are unchanged.

Pure XLA (pad / reshape / transpose / conv): autodiff provides the
backward, and the transform composes with jit/sharding like any conv.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def can_use_s2d(x_shape, kernel: int, strides, padding) -> bool:
    """The s2d rewrite models exactly kernel 4 / stride 2 / pad (1, 1)
    with even spatial extents -- the canonical PatchGAN geometry."""
    if kernel != 4:
        return False
    if tuple(strides) != (2,) * (len(x_shape) - 2):
        return False
    if any(tuple(p) != (1, 1) for p in padding):
        return False
    return all(n % 2 == 0 and n >= 4 for n in x_shape[1:-1])


def conv_k4s2_s2d(x: Array, w: Array, bias: Array | None = None) -> Array:
    """act-free 3D conv, kernel 4, stride 2, pad (1,1), channels-last,
    computed as a space-to-depth k2s1 VALID conv.  ``w`` keeps the
    standard flax/torch HWDIO shape (4, 4, 4, C, F)."""
    B, X, Y, Z, C = x.shape
    assert w.shape[:3] == (4, 4, 4) and w.shape[3] == C, w.shape
    F = w.shape[4]

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    P, Q, R = (X + 2) // 2, (Y + 2) // 2, (Z + 2) // 2
    # (B, P,2, Q,2, R,2, C) -> (B, P, Q, R, 2,2,2, C) -> (B,P,Q,R,8C)
    y = xp.reshape(B, P, 2, Q, 2, R, 2, C)
    y = y.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(B, P, Q, R, 8 * C)

    # w4[2a+ua, 2b+ub, 2c+uc, c, f] -> w2[a, b, c, ((ua,ub,uc), cin), f]
    w2 = w.reshape(2, 2, 2, 2, 2, 2, C, F)
    w2 = w2.transpose(0, 2, 4, 1, 3, 5, 6, 7).reshape(2, 2, 2, 8 * C, F)

    out = jax.lax.conv_general_dilated(
        y, w2.astype(y.dtype), (1, 1, 1), "VALID",
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
