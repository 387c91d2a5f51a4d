"""ResNet3D + ViT zoo forward tests (tiny, compile-lean)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfe_mamba_tpu.models.resnet3d import generate_model
from gfe_mamba_tpu.models.vit_zoo import (
    MAE, ClassifierViT, DinoHead, SimpleViT, ViT3D, dino_loss, ema_update,
)


def test_resnet3d_10_forward():
    model = generate_model(10, n_classes=3, n_input_channels=1,
                           block_inplanes=(4, 8, 8, 8))
    x = jnp.ones((1, 16, 16, 8, 1))
    variables = model.init(jax.random.key(0), x)
    y = model.apply(variables, x)
    assert y.shape == (1, 3)


def test_resnet3d_50_bottleneck_builds():
    model = generate_model(50, n_classes=2, n_input_channels=1,
                           block_inplanes=(2, 2, 2, 2))
    x = jax.ShapeDtypeStruct((1, 16, 16, 8, 1), jnp.float32)
    variables = jax.eval_shape(model.init, jax.random.key(0), x)
    out = jax.eval_shape(lambda v, xx: model.apply(v, xx), variables, x)
    assert out.shape == (1, 2)


def test_resnet3d_bad_depth():
    with pytest.raises(ValueError):
        generate_model(42)


def test_classifier_vit():
    m = ClassifierViT(image_size=16, patch_size=8, num_classes=5, dim=16,
                      depth=1, heads=2, mlp_dim=32, dim_head=8)
    x = jnp.ones((2, 16, 16, 1))
    y = m.apply(m.init(jax.random.key(0), x), x)
    assert y.shape == (2, 5)


def test_vit3d():
    m = ViT3D(image_size=(16, 16), image_depth=8, patch_size=8,
              depth_patch_size=4, num_classes=4, dim=16, depth=1, heads=2,
              mlp_dim=32, dim_head=8)
    x = jnp.ones((1, 16, 16, 8, 1))
    y = m.apply(m.init(jax.random.key(0), x), x)
    assert y.shape == (1, 4)


def test_simple_vit():
    m = SimpleViT(image_size=16, patch_size=8, num_classes=3, dim=16,
                  depth=1, heads=2, mlp_dim=32, dim_head=8)
    x = jnp.ones((2, 16, 16, 1))
    y = m.apply(m.init(jax.random.key(0), x), x)
    assert y.shape == (2, 3)


def test_mae_loss():
    m = MAE(image_size=16, patch_size=4, dim=16, depth=1, heads=2,
            mlp_dim=32, masking_ratio=0.5, decoder_dim=16, dim_head=8)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 1), jnp.float32)
    params = m.init(jax.random.key(0), x, jax.random.key(1))
    loss = m.apply(params, x, jax.random.key(2))
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_dino_pieces():
    s = jnp.asarray(np.random.RandomState(0).randn(4, 16), jnp.float32)
    t = s + 0.01
    loss = dino_loss(s, t)
    assert np.isfinite(float(loss))
    teacher = {"w": jnp.ones(3)}
    student = {"w": jnp.zeros(3)}
    updated = ema_update(teacher, student, momentum=0.9)
    np.testing.assert_allclose(np.asarray(updated["w"]), 0.9)


def test_mvcsnet_forward():
    from gfe_mamba_tpu.models.mvcs import MVCSNet
    m = MVCSNet(num_classes=1, base_channel=4, num_head=(2, 2, 2, 2))
    x = jnp.ones((1, 16, 16, 8, 1))
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    assert y.shape == (1, 1)
    assert np.isfinite(float(y[0, 0]))
