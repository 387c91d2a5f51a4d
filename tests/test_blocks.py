"""Shape/behaviour tests for the conv-order DSL blocks.

Models the reference's implicit smoke checks (model.py:472-479,
classifier.py:374-385) as real unit tests at CPU-friendly sizes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfe_mamba_tpu.ops import (
    SingleConv, DoubleConv, ResNetBlock, ResNetBlockSE,
    Encoder, Decoder, ChannelSELayer, SpatialSELayer, ChannelSpatialSELayer,
)


def _init_apply(module, x, **kwargs):
    params = module.init(jax.random.key(0), x, **kwargs)
    return module.apply(params, x, **kwargs), params


@pytest.mark.parametrize("order", ["gcr", "cge", "cl", "cr", "gcrd"])
def test_single_conv_orders(order):
    x = jnp.ones((2, 8, 8, 6, 4))
    y, params = _init_apply(SingleConv(out_channels=16, order=order), x)
    assert y.shape == (2, 8, 8, 6, 16)
    # bias present only without normalization
    has_bias = "bias" in params["params"]["conv"]
    assert has_bias == ("g" not in order and "b" not in order)


def test_single_conv_2d():
    x = jnp.ones((2, 16, 12, 4))
    y, _ = _init_apply(SingleConv(out_channels=8, order="gcr", dims=2), x)
    assert y.shape == (2, 16, 12, 8)


def test_double_conv_encoder_channel_split():
    x = jnp.ones((1, 8, 8, 8, 4))
    module = DoubleConv(out_channels=32, encoder=True)
    y, params = _init_apply(module, x)
    assert y.shape == (1, 8, 8, 8, 32)
    # first conv goes to out//2 = 16 in the encoder
    k = params["params"]["SingleConv1"]["conv"]["kernel"]
    assert k.shape[-1] == 16


def test_double_conv_decoder():
    x = jnp.ones((1, 8, 8, 8, 48))
    y, params = _init_apply(DoubleConv(out_channels=16, encoder=False), x)
    assert y.shape == (1, 8, 8, 8, 16)
    k = params["params"]["SingleConv1"]["conv"]["kernel"]
    assert k.shape[-1] == 16


def test_resnet_block_shortcut():
    x = jnp.ones((1, 6, 6, 6, 8))
    # channel change -> 1x1 conv shortcut exists
    y, params = _init_apply(ResNetBlock(out_channels=16), x)
    assert y.shape == (1, 6, 6, 6, 16)
    assert "conv1" in params["params"]
    # same channels -> identity shortcut
    y2, params2 = _init_apply(ResNetBlock(out_channels=8), x)
    assert y2.shape == x.shape
    assert "conv1" not in params2["params"]


def test_resnet_block_elu_output_range():
    # 'cge' order: final activation is ELU => outputs can dip below 0 but
    # never below -1
    x = jnp.asarray(np.random.RandomState(0).randn(1, 6, 6, 6, 8), jnp.float32)
    y, _ = _init_apply(ResNetBlock(out_channels=8, order="cge"), x)
    assert float(y.min()) >= -1.0


@pytest.mark.parametrize("se", ["scse", "cse", "sse"])
def test_resnet_block_se(se):
    x = jnp.ones((1, 6, 6, 6, 8))
    y, _ = _init_apply(ResNetBlockSE(out_channels=8, se_module=se), x)
    assert y.shape == x.shape


def test_se_layers():
    x = jnp.asarray(np.random.RandomState(1).randn(2, 4, 4, 4, 8), jnp.float32)
    for mod in (ChannelSELayer(), SpatialSELayer(), ChannelSpatialSELayer()):
        y, _ = _init_apply(mod, x)
        assert y.shape == x.shape


def test_encoder_pooling():
    x = jnp.ones((1, 8, 8, 8, 4))
    y, _ = _init_apply(Encoder(out_channels=8, basic_module="ResNetBlock",
                               order="cge", apply_pooling=True), x)
    assert y.shape == (1, 4, 4, 4, 8)
    y2, _ = _init_apply(Encoder(out_channels=8, basic_module="ResNetBlock",
                                order="cge", apply_pooling=False), x)
    assert y2.shape == (1, 8, 8, 8, 8)


def test_decoder_concat_join():
    skip = jnp.ones((1, 8, 8, 8, 8))
    x = jnp.ones((1, 4, 4, 4, 16))
    module = Decoder(out_channels=8, basic_module="DoubleConv")
    params = module.init(jax.random.key(0), skip, x)
    y = module.apply(params, skip, x)
    assert y.shape == (1, 8, 8, 8, 8)


def test_decoder_sum_join_deconv():
    skip = jnp.ones((1, 8, 8, 8, 8))
    x = jnp.ones((1, 4, 4, 4, 16))
    module = Decoder(out_channels=8, basic_module="ResNetBlock", order="cge")
    params = module.init(jax.random.key(0), skip, x)
    y = module.apply(params, skip, x)
    assert y.shape == (1, 8, 8, 8, 8)
    # summation joining => deconv upsampling parameters exist
    assert "upsampling" in params["params"]


def test_gradient_flow_resnet_block():
    """Every parameter receives a gradient (reference's print-based
    gradient-flow check, sd_cross_atten.py:72-95, automated)."""
    x = jnp.asarray(np.random.RandomState(2).randn(1, 6, 6, 6, 4), jnp.float32)
    module = ResNetBlock(out_channels=8)
    params = module.init(jax.random.key(0), x)

    def loss_fn(p):
        return jnp.sum(module.apply(p, x) ** 2)

    grads = jax.grad(loss_fn)(params)
    for path, g in jax.tree_util.tree_leaves_with_path(grads):
        assert float(jnp.abs(g).sum()) > 0, f"zero grad at {path}"
