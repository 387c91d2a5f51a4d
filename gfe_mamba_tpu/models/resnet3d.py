"""3D ResNet family (10/18/34/50/101/152/200).

Re-implements reference pytorch3dunet/threedresnet.py (generate_model,
threedresnet.py:102-233): the Kinetics-style 3D ResNet used as an
alternative volumetric feature extractor/classifier (referenced by the
classify configs' ``resume_path: r3d101_KM_200ep.pth``).

Channels-last (B, X, Y, Z, C); BasicBlock for depths 10/18/34,
Bottleneck for 50+.  ``no_max_pool`` and ``widen_factor`` follow the
reference constructor knobs; classification head = global average pool
+ Dense(n_classes).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class BasicBlock3D(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        residual = x
        y = nn.Conv(self.planes, (3, 3, 3), strides=(self.stride,) * 3,
                    padding=1, use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, name="bn1")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.planes, (3, 3, 3), padding=1, use_bias=False,
                    name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = nn.Conv(self.planes, (1, 1, 1),
                               strides=(self.stride,) * 3, use_bias=False,
                               name="downsample")(x)
            residual = nn.BatchNorm(use_running_average=not train,
                                    name="downsample_bn")(residual)
        return jax.nn.relu(y + residual)


class Bottleneck3D(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        out_planes = self.planes * self.expansion
        residual = x
        y = nn.Conv(self.planes, (1, 1, 1), use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, name="bn1")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.planes, (3, 3, 3), strides=(self.stride,) * 3,
                    padding=1, use_bias=False, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn2")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(out_planes, (1, 1, 1), use_bias=False, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn3")(y)
        if self.stride != 1 or x.shape[-1] != out_planes:
            residual = nn.Conv(out_planes, (1, 1, 1),
                               strides=(self.stride,) * 3, use_bias=False,
                               name="downsample")(x)
            residual = nn.BatchNorm(use_running_average=not train,
                                    name="downsample_bn")(residual)
        return jax.nn.relu(y + residual)


class ResNet3D(nn.Module):
    """Kinetics-style 3D ResNet (threedresnet.py:102-196)."""

    block: str                     # 'basic' | 'bottleneck'
    layers: Sequence[int]
    block_inplanes: Sequence[int] = (64, 128, 256, 512)
    n_classes: int = 1039
    n_input_channels: int = 3
    conv1_t_size: int = 7
    conv1_t_stride: int = 1
    no_max_pool: bool = False
    widen_factor: float = 1.0
    feature_only: bool = False

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        planes = [int(p * self.widen_factor) for p in self.block_inplanes]
        x = nn.Conv(planes[0], (7, 7, self.conv1_t_size),
                    strides=(2, 2, self.conv1_t_stride),
                    padding=[(3, 3), (3, 3), (self.conv1_t_size // 2,) * 2],
                    use_bias=False, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn1")(x)
        x = jax.nn.relu(x)
        if not self.no_max_pool:
            x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2),
                            padding=[(1, 1)] * 3)

        block_cls = BasicBlock3D if self.block == "basic" else Bottleneck3D
        for stage, (n_blocks, width) in enumerate(zip(self.layers, planes)):
            for b in range(n_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = block_cls(width, stride,
                              name=f"layer{stage + 1}_{b}")(x, train=train)

        x = jnp.mean(x, axis=(1, 2, 3))          # global average pool
        if self.feature_only:
            return x
        return nn.Dense(self.n_classes, name="fc")(x)


_DEPTH_SPECS = {
    10: ("basic", (1, 1, 1, 1)),
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
    200: ("bottleneck", (3, 24, 36, 3)),
}


def generate_model(model_depth: int, **kwargs) -> ResNet3D:
    """threedresnet.py:199-233 factory: depth in {10,18,34,50,101,152,200}."""
    if model_depth not in _DEPTH_SPECS:
        raise ValueError(f"model_depth must be one of {sorted(_DEPTH_SPECS)}")
    block, layers = _DEPTH_SPECS[model_depth]
    return ResNet3D(block=block, layers=layers, **kwargs)
