"""Mamba selective-state-space model (flax.linen, TPU-native).

Re-implements the reference pure-PyTorch Mamba (cross_atten/mamba.py):
``MambaConfig`` (mamba.py:31-59) with the dt init law (mamba.py:139-156)
and S4D-real A init (mamba.py:159-162); ``Mamba`` as a stack of
residual ``MambaBlock`` + RMSNorm (mamba.py:61-117); the selective scan
runs through :mod:`gfe_mamba_tpu.ops.scan` (associative by default,
sequential / Pallas selectable) -- the same three-path structure as the
reference (pscan / sequential / CUDA kernel).

Recurrent O(1)-state inference is exposed as ``Mamba.step`` with a
``(h, conv window)`` cache per layer (mamba.py:320-405), usable via
``model.apply(params, x, caches, method=Mamba.step)``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from gfe_mamba_tpu.ops.scan import selective_scan, selective_scan_step

Array = jax.Array


@dataclass(frozen=True)
class MambaConfig:
    """Hyper-parameters (reference mamba.py:31-59)."""

    d_model: int                     # D
    n_layers: int
    dt_rank: int | str = "auto"
    d_state: int = 16                # N
    expand_factor: int = 2           # E
    d_conv: int = 4

    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_init: str = "random"          # "random" | "constant"
    dt_scale: float = 1.0
    dt_init_floor: float = 1e-4

    rms_norm_eps: float = 1e-5

    bias: bool = False
    conv_bias: bool = True
    inner_layernorms: bool = False   # used by Jamba

    scan_mode: str = "associative"   # 'associative' | 'sequential' | 'pallas'

    @property
    def d_inner(self) -> int:        # ED
        return self.expand_factor * self.d_model

    @property
    def dt_rank_(self) -> int:
        if self.dt_rank == "auto":
            return math.ceil(self.d_model / 16)
        return int(self.dt_rank)


class RMSNorm(nn.Module):
    """x * rsqrt(mean(x^2) + eps) * weight (mamba.py:408-418)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        weight = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        rms = jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True)
                            + self.eps)
        return x * rms * weight


def _dt_proj_kernel_init(config: MambaConfig):
    std = config.dt_rank_ ** -0.5 * config.dt_scale

    def init(key, shape, dtype=jnp.float32):
        if config.dt_init == "constant":
            return jnp.full(shape, std, dtype)
        if config.dt_init == "random":
            return jax.random.uniform(key, shape, dtype, -std, std)
        raise NotImplementedError(config.dt_init)

    return init


def _dt_proj_bias_init(config: MambaConfig):
    """Bias = softplus^-1(dt) with dt ~ LogUniform[dt_min, dt_max]
    (mamba.py:150-155)."""

    def init(key, shape, dtype=jnp.float32):
        dt = jnp.exp(
            jax.random.uniform(key, shape, dtype)
            * (math.log(config.dt_max) - math.log(config.dt_min))
            + math.log(config.dt_min)
        )
        dt = jnp.clip(dt, config.dt_init_floor, None)
        return dt + jnp.log(-jnp.expm1(-dt))

    return init


def _a_log_init(config: MambaConfig):
    """S4D-real: A[e, n] = n+1, stored as log (mamba.py:159-162)."""

    def init(key, shape, dtype=jnp.float32):
        a = jnp.tile(jnp.arange(1, config.d_state + 1, dtype=dtype),
                     (config.d_inner, 1))
        return jnp.log(a)

    return init


class MambaBlock(nn.Module):
    """in_proj -> causal depthwise conv -> silu -> SSM -> gate -> out_proj
    (mamba.py:119-263)."""

    config: MambaConfig

    def setup(self):
        cfg = self.config
        self.in_proj = nn.Dense(2 * cfg.d_inner, use_bias=cfg.bias,
                                name="in_proj")
        # depthwise causal conv over time; left-pad d_conv-1 == the
        # reference's symmetric pad + [:L] truncation (mamba.py:128-131,209)
        self.conv1d = nn.Conv(cfg.d_inner, kernel_size=(cfg.d_conv,),
                              feature_group_count=cfg.d_inner,
                              padding=[(cfg.d_conv - 1, 0)],
                              use_bias=cfg.conv_bias, name="conv1d")
        self.x_proj = nn.Dense(cfg.dt_rank_ + 2 * cfg.d_state,
                               use_bias=False, name="x_proj")
        # dt projection as raw params so the bias+softplus can fuse into
        # the scan (the CUDA fusion boundary, mamba.py:238-251)
        self.dt_kernel = self.param("dt_proj_kernel", _dt_proj_kernel_init(cfg),
                                    (cfg.dt_rank_, cfg.d_inner))
        self.dt_bias = self.param("dt_proj_bias", _dt_proj_bias_init(cfg),
                                  (cfg.d_inner,))
        self.A_log = self.param("A_log", _a_log_init(cfg),
                                (cfg.d_inner, cfg.d_state))
        self.D = self.param("D", nn.initializers.ones, (cfg.d_inner,))
        self.out_proj = nn.Dense(cfg.d_model, use_bias=cfg.bias,
                                 name="out_proj")
        if cfg.inner_layernorms:
            self.dt_layernorm = RMSNorm(cfg.rms_norm_eps, name="dt_layernorm")
            self.B_layernorm = RMSNorm(cfg.rms_norm_eps, name="B_layernorm")
            self.C_layernorm = RMSNorm(cfg.rms_norm_eps, name="C_layernorm")

    def _delta_bc(self, x: Array):
        cfg = self.config
        deltaBC = self.x_proj(x)
        delta, B, C = jnp.split(
            deltaBC, [cfg.dt_rank_, cfg.dt_rank_ + cfg.d_state], axis=-1
        )
        if cfg.inner_layernorms:
            delta = self.dt_layernorm(delta)
            B = self.B_layernorm(B)
            C = self.C_layernorm(C)
        return delta, B, C

    def __call__(self, x: Array) -> Array:
        # x: (B, L, D) -> (B, L, D)
        cfg = self.config
        xz = self.in_proj(x)
        x, z = jnp.split(xz, 2, axis=-1)          # (B, L, ED) each
        x = self.conv1d(x)                        # causal depthwise conv
        x = jax.nn.silu(x)

        A = -jnp.exp(self.A_log.astype(jnp.float32))
        delta, B, C = self._delta_bc(x)
        delta = delta @ self.dt_kernel
        y = selective_scan(
            x, delta, A, B, C, self.D, z=z, delta_bias=self.dt_bias,
            delta_softplus=True, mode=cfg.scan_mode,
        )
        return self.out_proj(y)

    def step(self, x: Array, cache):
        """One token (mamba.py:342-373). x: (B, D); cache=(h, conv_in)
        with h: (B, ED, N), conv_in: (B, d_conv-1, ED)."""
        cfg = self.config
        h, conv_in = cache

        xz = self.in_proj(x)
        x, z = jnp.split(xz, 2, axis=-1)          # (B, ED)

        window = jnp.concatenate([conv_in, x[:, None, :]], axis=1)
        x_conv = self.conv1d(window)[:, -1, :]    # causal tail == valid conv
        x_conv = jax.nn.silu(x_conv)

        A = -jnp.exp(self.A_log.astype(jnp.float32))
        delta, B, C = self._delta_bc(x_conv)
        delta = jax.nn.softplus(delta @ self.dt_kernel + self.dt_bias)
        y, h = selective_scan_step(h, x_conv, delta, A, B, C, self.D)

        y = y * jax.nn.silu(z)
        out = self.out_proj(y)
        new_cache = (h, window[:, 1:, :])
        return out, new_cache


class ResidualBlock(nn.Module):
    """mixer(norm(x)) + x (mamba.py:91-117)."""

    config: MambaConfig

    def setup(self):
        self.mixer = MambaBlock(self.config, name="mixer")
        self.norm = RMSNorm(self.config.rms_norm_eps, name="norm")

    def __call__(self, x: Array) -> Array:
        return self.mixer(self.norm(x)) + x

    def step(self, x: Array, cache):
        out, cache = self.mixer.step(self.norm(x), cache)
        return out + x, cache


class Mamba(nn.Module):
    """Stack of residual Mamba blocks (mamba.py:61-89)."""

    config: MambaConfig

    def setup(self):
        self.layers = [ResidualBlock(self.config, name=f"layer_{i}")
                       for i in range(self.config.n_layers)]

    def __call__(self, x: Array) -> Array:
        for layer in self.layers:
            x = layer(x)
        return x

    def step(self, x: Array, caches):
        """x: (B, D) one token; caches: list of per-layer (h, conv_in)."""
        new_caches = []
        for layer, cache in zip(self.layers, caches):
            x, cache = layer.step(x, cache)
            new_caches.append(cache)
        return x, new_caches

    def init_cache(self, batch: int, dtype=jnp.float32):
        cfg = self.config
        return [
            (jnp.zeros((batch, cfg.d_inner, cfg.d_state), dtype),
             jnp.zeros((batch, cfg.d_conv - 1, cfg.d_inner), dtype))
            for _ in range(cfg.n_layers)
        ]
