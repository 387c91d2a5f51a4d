"""Fused GroupNorm(+activation) Pallas TPU kernel.

The UNet's conv-order DSL interleaves GroupNorm + ELU/ReLU with every
conv (buildingblocks.py 'gcr'/'cge' orders); at the full-resolution
stages each GroupNorm pass moves ~300 MB of activations, and XLA's
lowering reaches only a fraction of HBM bandwidth.  This kernel does
the canonical two passes with explicit chunking:

  pass 1: per-(batch, group) sum / sum-of-squares, accumulated in a
          VMEM block revisited across the spatial-chunk grid axis
  pass 2: normalize + affine + optional ELU/ReLU fused in one sweep

Grid = (batch, spatial chunks); accumulation relies on Pallas keeping an
output block resident while consecutive grid steps map to it.  The
backward pass re-derives gradients through the jnp reference formulation
(custom_vjp), so the kernel is used on the inference/serving path and in
forward-heavy training phases.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _stats_kernel(x_ref, sums_ref):
    # x_ref: (1, S_t, C); sums_ref: (1, 2, C) accumulated across chunks.
    # Per-CHANNEL sums only -- the tiny group reduction happens outside
    # the kernel (Mosaic cannot reshape the lane dimension).
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        sums_ref[...] = jnp.zeros_like(sums_ref)

    x = x_ref[0].astype(jnp.float32)                # (S_t, C)
    sums_ref[0, 0:1, :] += jnp.sum(x, axis=0)[None, :]
    sums_ref[0, 1:2, :] += jnp.sum(x * x, axis=0)[None, :]


def _apply_kernel(x_ref, mean_ref, inv_ref, scale_ref, bias_ref, out_ref,
                  *, act: str):
    x = x_ref[0].astype(jnp.float32)                # (S_t, C)
    y = (x - mean_ref[0, 0]) * inv_ref[0, 0] * scale_ref[0] + bias_ref[0]
    if act == "elu":
        # jax.nn.elu lowers via expm1, which Pallas TPU lacks
        y = jnp.where(y > 0, y, jnp.exp(jnp.minimum(y, 0.0)) - 1.0)
    elif act == "relu":
        y = jax.nn.relu(y)
    elif act == "leaky_relu":
        y = jax.nn.leaky_relu(y, 0.01)
    out_ref[0] = y.astype(out_ref.dtype)


def _forward(x, scale, bias, num_groups, eps, act, chunk, interpret):
    orig_shape = x.shape
    b, c = x.shape[0], x.shape[-1]
    s = 1
    for d in x.shape[1:-1]:
        s *= d
    xf = x.reshape(b, s, c)

    s_t = min(chunk, s)
    # pad S to a multiple of the chunk (zeros don't disturb the stats
    # count because we divide by the true count)
    s_pad = (s + s_t - 1) // s_t * s_t
    if s_pad != s:
        xf = jnp.pad(xf, [(0, 0), (0, s_pad - s), (0, 0)])
    num_chunks = s_pad // s_t

    sums = pl.pallas_call(
        _stats_kernel,
        grid=(b, num_chunks),
        in_specs=[pl.BlockSpec((1, s_t, c), lambda i, j: (i, j, 0))],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        interpret=interpret,
    )(xf)

    # group reduction over the tiny (B, 2, C) sums in plain XLA
    # (padded zero rows contributed nothing; divide by the true count)
    gsize = c // num_groups
    count = float(s * gsize)
    per_group = sums.reshape(b, 2, num_groups, gsize).sum(-1)   # (B,2,G)
    mean_g = per_group[:, 0] / count                            # (B,G)
    var_g = per_group[:, 1] / count - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean_g, gsize, axis=-1)[:, None, :]     # (B,1,C)
    inv_c = jnp.repeat(inv_g, gsize, axis=-1)[:, None, :]

    out = pl.pallas_call(
        functools.partial(_apply_kernel, act=act),
        grid=(b, num_chunks),
        in_specs=[
            pl.BlockSpec((1, s_t, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s_t, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, c), x.dtype),
        interpret=interpret,
    )(xf, mean_c, inv_c, scale[None, :], bias[None, :])

    return out[:, :s].reshape(orig_shape)


def _reference(x, scale, bias, num_groups, eps, act):
    b, c = x.shape[0], x.shape[-1]
    spatial = x.shape[1:-1]
    gsize = c // num_groups
    xg = x.astype(jnp.float32).reshape(b, -1, num_groups, gsize)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 3), keepdims=True)
    y = (xg - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, -1, c) * scale + bias
    if act == "elu":
        y = jax.nn.elu(y)
    elif act == "relu":
        y = jax.nn.relu(y)
    elif act == "leaky_relu":
        y = jax.nn.leaky_relu(y, 0.01)
    return y.reshape(x.shape).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _group_norm_act(x, scale, bias, num_groups, eps, act, chunk, interpret):
    return _forward(x, scale, bias, num_groups, eps, act, chunk, interpret)


def _vjp_fwd(x, scale, bias, num_groups, eps, act, chunk, interpret):
    y = _forward(x, scale, bias, num_groups, eps, act, chunk, interpret)
    return y, (x, scale, bias)


def _vjp_bwd(num_groups, eps, act, chunk, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x, s, b: _reference(x, s, b, num_groups, eps, act),
        x, scale, bias)
    return vjp(g)


_group_norm_act.defvjp(_vjp_fwd, _vjp_bwd)


def group_norm_act(x: Array, scale: Array, bias: Array, *,
                   num_groups: int, eps: float = 1e-5, act: str = "none",
                   chunk: int = 4096, interpret: bool | None = None) -> Array:
    """Fused GroupNorm + activation over channels-last ``x``.

    act: 'none' | 'elu' | 'relu' | 'leaky_relu'."""
    c = x.shape[-1]
    assert c % num_groups == 0, (c, num_groups)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _group_norm_act(x, scale, bias, num_groups, eps, act, chunk,
                           interpret)
