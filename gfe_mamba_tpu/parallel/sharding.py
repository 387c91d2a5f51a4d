"""Parameter sharding rules: tensor-parallel placement for large kernels.

Rather than annotating every module, parameters are sharded by
pattern-matching the pytree path + shape.  GSPMD then propagates the
layouts and inserts the collectives.  Rules (largest wins):

* MoE stacked expert kernels (``experts_*``, shape (E, d, f)):
  dim 0 over ``model`` (expert parallelism -- each chip holds E/m
  experts; the dense dispatch einsum reduces over E with a psum).
* Dense kernels whose input dim >= ``threshold`` (the 25600-wide
  cross-attention K/V projections, sd_cross_atten.py:43-44): row
  parallel P('model', None) -- the huge input axis is sharded, the
  contraction inserts a reduce-scatter/psum.
* Dense kernels whose output dim >= ``threshold`` (the 409600-out ViT
  patch_unembed): column parallel P(None, 'model').
* Everything else: replicated.

With a mesh whose ``model`` axis has size 1 every rule degenerates to
replication, so the same code path serves pure data parallelism.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _rule(path: str, shape: tuple, mesh: Mesh, axis: str,
          threshold: int) -> P:
    axis_size = mesh.shape[axis]
    if axis_size == 1:
        return P()
    if "experts_" in path and len(shape) == 3:
        if shape[0] % axis_size == 0:
            return P(axis, None, None)
        return P()
    if len(shape) == 2 and path.endswith("kernel"):
        fan_in, fan_out = shape
        if fan_in >= threshold and fan_in % axis_size == 0:
            return P(axis, None)
        if fan_out >= threshold and fan_out % axis_size == 0:
            return P(None, axis)
    return P()


def infer_param_shardings(params: Any, mesh: Mesh, *, axis: str = "model",
                          threshold: int = 16384) -> Any:
    """Pytree of NamedShardings matching ``params``."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    for path, leaf in flat:
        path_str = "/".join(str(getattr(k, "key", k)) for k in path)
        spec = _rule(path_str, tuple(np.shape(leaf)), mesh, axis, threshold)
        specs.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, specs)


def apply_param_shardings(params: Any, shardings: Any) -> Any:
    """device_put every param leaf onto its inferred sharding."""
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
