"""Multi-host (multi-process) runtime: the DCN story.

Replaces the reference's Accelerate multi-node DDP launch
(main_gan_vit.py:31,54-56 -- ``accelerator = Accelerator(...)``,
``accelerator.is_main_process``) with the JAX SPMD equivalents:

* :func:`initialize` -- ``jax.distributed.initialize`` with env-var
  autodetection (a no-op for single-process runs, so every entry point
  can call it unconditionally).
* :func:`is_main_process` / :func:`process_count` -- the
  ``is_main_process`` gates for logging and checkpointing.
* :func:`local_batch_slice` -- which rows of the *global* batch this
  process must load (each process reads a disjoint shard; see
  ``DataLoader(process_shard=...)``).
* :func:`form_global_array` -- assemble per-process host shards into
  one globally-sharded ``jax.Array`` over the mesh's data axis
  (``jax.make_array_from_process_local_data``), so a pjit step sees a
  single logical batch regardless of process topology.

Design note: under GSPMD every process runs the SAME pjit program over
the global mesh; gradient averaging across hosts is the same XLA psum
that serves single-host data parallelism, riding DCN only for the mesh
axes that span hosts.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_INITIALIZED = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[list[int]] = None) -> None:
    """Bring up the multi-process JAX runtime (idempotent).

    Arguments default to the standard env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``; cloud TPU pods autodetect all three).  When
    nothing indicates a multi-process launch this is a no-op, so entry
    points call it unconditionally.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None)
    env_pid = os.environ.get("JAX_PROCESS_ID")
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None)

    # real multi-worker TPU pod: >1 comma-separated worker hostnames
    # (a bare single hostname also appears on some single-host runtimes)
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    tpu_pod = ("," in hostnames) or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS")
    multi = (num_processes or 0) > 1 or tpu_pod
    if coordinator_address is None and not multi:
        return  # single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    _INITIALIZED = True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    """``accelerator.is_main_process`` equivalent (main_gan_vit.py:54)."""
    return jax.process_index() == 0


def local_batch_slice(global_batch: int,
                      pid: Optional[int] = None,
                      nproc: Optional[int] = None) -> slice:
    """Rows of the global batch owned by this process.

    The global batch is split into ``nproc`` contiguous equal blocks
    (global_batch must divide evenly -- SPMD needs identical shapes on
    every process).
    """
    pid = jax.process_index() if pid is None else pid
    nproc = jax.process_count() if nproc is None else nproc
    if global_batch % nproc:
        raise ValueError(
            f"global batch {global_batch} not divisible by {nproc} processes")
    per = global_batch // nproc
    return slice(pid * per, (pid + 1) * per)


def host_local(tree: Any) -> Any:
    """Globally-sharded jax.Array pytree -> host-local numpy.

    For fully-replicated leaves (params after a DP step) this reads the
    process-local copy with no communication; partially-sharded leaves
    go through an allgather.  Every process must call this (the
    allgather branch is collective); the result is ordinary numpy, so
    process-0-only work (npz dumps, PNG grids, local eval) can then run
    without touching non-addressable shards.  Fixes the
    'is_main_process-gated jit on global arrays' deadlock class
    (ADVICE r2, main_gan_vit.py:118).
    """

    def _pull(x):
        if not isinstance(x, jax.Array):
            return x
        if x.is_fully_addressable or x.is_fully_replicated:
            return np.asarray(x.addressable_data(0)
                              if not x.is_fully_addressable else x)
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))

    return jax.tree_util.tree_map(_pull, tree)


def form_global_array(local_batch: Any, mesh: Mesh,
                      axis: str = "data") -> Any:
    """Per-process host arrays -> one globally-sharded jax.Array pytree.

    ``local_batch`` leaves hold only this process's rows; the result is
    the logical global batch, dim 0 sharded over ``axis``.  Works
    unchanged in single-process runs (where local == global).
    """
    sharding = NamedSharding(mesh, P(axis))

    def _form(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return x
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x), global_shape)

    return jax.tree_util.tree_map(_form, local_batch)
