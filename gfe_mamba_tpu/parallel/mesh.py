"""Device mesh construction and batch sharding helpers.

The TPU-native parallelism story (replacing the reference's
Accelerate/DDP wrapper, main_gan_vit.py:31,54-56 -- SURVEY.md 2.16):
one named ``jax.sharding.Mesh`` whose ``data`` axis carries
data-parallelism over ICI (gradient averaging becomes an XLA-inserted
psum) and whose optional ``model`` axis tensor-parallel shards the
large kernels (ViT patch embedding, cross-attention K/V, MoE experts).

Multi-process/multi-host: ``jax.process_index() == 0`` replaces
``accelerator.is_main_process``.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Mapping[str, int] | None = None,
              devices: Sequence | None = None) -> Mesh:
    """Build a mesh from {axis: size}; one axis may be -1 (remaining).

    Default: all devices on a single ``data`` axis."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if axes is None:
        axes = {"data": len(devices)}
    axes = dict(axes)
    known = int(np.prod([s for s in axes.values() if s != -1]))
    for name, size in axes.items():
        if size == -1:
            axes[name] = len(devices) // known
    total = int(np.prod(list(axes.values())))
    if total != len(devices):
        raise ValueError(
            f"mesh {axes} needs {total} devices, have {len(devices)}")
    mesh_devices = devices.reshape(tuple(axes.values()))
    return Mesh(mesh_devices, tuple(axes.keys()))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """device_put every array leaf of a batch dict with batch sharding."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding)
        if hasattr(x, "ndim") and x.ndim > 0 else x,
        batch,
    )
