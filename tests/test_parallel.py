"""Multi-device tests on the virtual 8-device CPU mesh: mesh building,
batch/param sharding, and data-parallel train-step equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from gfe_mamba_tpu.parallel.mesh import (
    batch_sharding, make_mesh, replicated, shard_batch,
)
from gfe_mamba_tpu.parallel.sharding import (
    apply_param_shardings, infer_param_shardings,
)


def test_make_mesh_default_and_2d():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    mesh = make_mesh()
    assert mesh.shape == {"data": 8}
    mesh2 = make_mesh({"data": -1, "model": 2})
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh({"data": 3})


def test_shard_batch_places_data_axis():
    mesh = make_mesh()
    batch = {"image": np.ones((8, 4, 4), np.float32),
             "name": ["x"] * 8}
    sharded = shard_batch(batch, mesh)
    sh = sharded["image"].sharding
    assert sh.spec == P("data")
    assert sharded["name"] == ["x"] * 8


def test_infer_param_shardings_rules():
    mesh = make_mesh({"data": 4, "model": 2})
    params = {
        "big_in": {"kernel": np.zeros((32768, 64))},
        "big_out": {"kernel": np.zeros((64, 32768))},
        "small": {"kernel": np.zeros((64, 64)), "bias": np.zeros((64,))},
        "moe": {"experts_gate": np.zeros((8, 16, 32))},
    }
    sh = infer_param_shardings(params, mesh)
    assert sh["big_in"]["kernel"].spec == P("model", None)
    assert sh["big_out"]["kernel"].spec == P(None, "model")
    assert sh["small"]["kernel"].spec == P()
    assert sh["moe"]["experts_gate"].spec == P("model", None, None)
    # model axis of size 1 -> everything replicated
    mesh1 = make_mesh({"data": 8, "model": 1})
    sh1 = infer_param_shardings(params, mesh1)
    assert sh1["big_in"]["kernel"].spec == P()


def test_data_parallel_step_matches_single_device():
    """A jitted DP train step over the 8-device mesh produces the same
    update as single-device execution (the psum-mean gradient identity
    replacing DDP allreduce, SURVEY.md 2.16)."""
    mesh = make_mesh()

    def predict(w, x):
        return jnp.tanh(x @ w["k"]) @ w["q"]

    def loss_fn(w, x, y):
        return jnp.mean((predict(w, x) - y) ** 2)

    tx = optax.adam(1e-2)
    rng = np.random.RandomState(0)
    w = {"k": jnp.asarray(rng.randn(6, 8), jnp.float32),
         "q": jnp.asarray(rng.randn(8, 2), jnp.float32)}
    x = jnp.asarray(rng.randn(16, 6), jnp.float32)
    y = jnp.asarray(rng.randn(16, 2), jnp.float32)
    opt = tx.init(w)

    def step(w, opt, x, y):
        grads = jax.grad(loss_fn)(w, x, y)
        updates, opt = tx.update(grads, opt, w)
        return optax.apply_updates(w, updates), opt

    # single device
    w1, _ = jax.jit(step)(w, opt, x, y)

    # data-parallel: shard batch over 'data', replicate params
    xs = jax.device_put(x, batch_sharding(mesh))
    ys = jax.device_put(y, batch_sharding(mesh))
    wr = jax.device_put(w, replicated(mesh))
    optr = jax.device_put(opt, replicated(mesh))
    w8, _ = jax.jit(step)(wr, optr, xs, ys)

    for key in w:
        np.testing.assert_allclose(np.asarray(w1[key]), np.asarray(w8[key]),
                                   rtol=2e-5, atol=2e-5)


def test_tensor_parallel_matmul_matches_replicated():
    """Sharding a big kernel over the model axis must not change the
    math (GSPMD inserts the collectives)."""
    mesh = make_mesh({"data": 4, "model": 2})
    rng = np.random.RandomState(1)
    params = {"proj": {"kernel": jnp.asarray(rng.randn(32768, 16) * 0.01,
                                             jnp.float32)}}
    x = jnp.asarray(rng.randn(4, 32768), jnp.float32)

    def f(p, x):
        return x @ p["proj"]["kernel"]

    expected = f(params, x)
    shardings = infer_param_shardings(params, mesh)
    sharded = apply_param_shardings(params, shardings)
    got = jax.jit(f)(sharded, jax.device_put(x, replicated(mesh)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-4, atol=1e-4)


def test_dataloader_device_sharding():
    """DataLoader with a NamedSharding places batches across the mesh."""
    from gfe_mamba_tpu.data.loader import DataLoader
    mesh = make_mesh()

    class DS:
        def __len__(self):
            return 16
        def __getitem__(self, i):
            return {"x": np.full((4,), i, np.float32)}

    loader = DataLoader(DS(), batch_size=8, shuffle=False, prefetch=0,
                        sharding=batch_sharding(mesh))
    batch = next(iter(loader))
    assert batch["x"].sharding.spec == P("data")
    assert batch["x"].shape == (8, 4)
