"""Multi-host (multi-process) runtime tests.

The DCN story (SURVEY.md 2.16; replaces Accelerate multi-node DDP,
reference main_gan_vit.py:31,54-56): per-process disjoint dataset
shards, global-batch assembly via make_array_from_process_local_data,
and a REAL two-process jax.distributed run (subprocesses with a local
TCP coordinator) whose sharded loss matches the single-process value.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from gfe_mamba_tpu.data.loader import DataLoader  # noqa: E402
from gfe_mamba_tpu.parallel import multihost  # noqa: E402
from gfe_mamba_tpu.parallel.mesh import make_mesh  # noqa: E402


class IndexDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"idx": np.asarray(i), "x": np.full((3,), float(i))}


def _collect(loader):
    return [batch["idx"].tolist() for batch in loader]


def test_loader_process_shards_disjoint_and_complete():
    n, per_bs, nproc = 64, 4, 2
    loaders = [DataLoader(IndexDataset(n), per_bs, shuffle=True, seed=7,
                          prefetch=0, process_shard=(pid, nproc))
               for pid in range(nproc)]
    batches = [_collect(ld) for ld in loaders]
    assert len(batches[0]) == len(batches[1]) == n // (per_bs * nproc)
    flat = [i for b in batches for chunk in b for i in chunk]
    assert len(flat) == n
    assert sorted(flat) == list(range(n))  # disjoint + complete
    # each process's shuffle must be the SAME global order
    ld_single = DataLoader(IndexDataset(n), per_bs * nproc, shuffle=True,
                           seed=7, prefetch=0)
    global_batches = _collect(ld_single)
    for k, gb in enumerate(global_batches):
        assert gb[:per_bs] == batches[0][k]
        assert gb[per_bs:] == batches[1][k]


def test_loader_process_shard_len_and_validation():
    assert len(DataLoader(IndexDataset(40), 4, prefetch=0,
                          process_shard=(0, 2))) == 5
    with pytest.raises(ValueError):
        DataLoader(IndexDataset(8), 2, process_shard=(2, 2))


def test_local_batch_slice():
    assert multihost.local_batch_slice(8, 0, 2) == slice(0, 4)
    assert multihost.local_batch_slice(8, 1, 2) == slice(4, 8)
    with pytest.raises(ValueError):
        multihost.local_batch_slice(9, 0, 2)


def test_form_global_array_single_process():
    import jax
    mesh = make_mesh({"data": 4, "model": 2})
    batch = {"x": np.arange(8 * 3, dtype=np.float32).reshape(8, 3),
             "y": np.arange(8)}
    out = multihost.form_global_array(batch, mesh)
    assert out["x"].shape == (8, 3)
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])
    # dim 0 sharded over data axis
    assert out["x"].sharding.spec == jax.sharding.PartitionSpec("data")


_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import numpy as np
    sys.path.insert(0, {repo!r})
    from gfe_mamba_tpu.data.loader import DataLoader
    from gfe_mamba_tpu.parallel import multihost
    from gfe_mamba_tpu.parallel.mesh import make_mesh

    pid = int(sys.argv[1]); port = sys.argv[2]
    multihost.initialize(coordinator_address="127.0.0.1:" + port,
                         num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert jax.device_count() == 4 and len(jax.local_devices()) == 2

    class DS:
        def __len__(self):
            return 16
        def __getitem__(self, i):
            return {{"idx": np.asarray(i),
                     "x": np.full((2,), float(i) + 1.0)}}

    loader = DataLoader(DS(), 2, shuffle=True, seed=3, prefetch=0,
                        process_shard=(pid, 2))
    mesh = make_mesh({{"data": 4}})

    import jax.numpy as jnp
    @jax.jit
    def step(x):
        return jnp.mean(x ** 2)

    seen = []
    losses = []
    for batch in loader:
        seen.extend(batch["idx"].tolist())
        gx = multihost.form_global_array({{"x": batch["x"]}}, mesh)["x"]
        assert gx.shape == (4, 2)   # global batch
        losses.append(float(step(gx)))
    print("SEEN", pid, sorted(seen))
    print("LOSS", pid, " ".join(f"{{v:.6f}}" for v in losses))
""")


def test_two_process_distributed_run(tmp_path):
    """Two real OS processes, local TCP coordinator, 2 virtual CPU
    devices each -> 4-device global data mesh; each process loads a
    disjoint shard and both compute identical global losses that match
    a single-process replay."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=REPO))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), port],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    def parse(out, tag):
        for line in out.splitlines():
            if line.startswith(tag):
                return line.split(None, 2)[2]
        raise AssertionError(f"{tag} not found in {out!r}")

    seen0 = eval(parse(outs[0], "SEEN"))
    seen1 = eval(parse(outs[1], "SEEN"))
    assert not set(seen0) & set(seen1), "process shards overlap"
    assert sorted(seen0 + seen1) == list(range(16))
    # identical global loss on both processes (same SPMD program)
    assert parse(outs[0], "LOSS") == parse(outs[1], "LOSS")
    # matches a single-process replay of the same global batches
    loader = DataLoader(IndexDataset(16), 4, shuffle=True, seed=3,
                        prefetch=0)
    expect = []
    for batch in loader:
        x = np.stack([np.full((2,), i + 1.0) for i in batch["idx"]])
        expect.append(float(np.mean(x ** 2)))
    got = [float(v) for v in parse(outs[0], "LOSS").split()]
    np.testing.assert_allclose(got, expect, rtol=1e-6)
