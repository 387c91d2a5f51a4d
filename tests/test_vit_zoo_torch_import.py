"""Golden logit-parity tests for the 3D-capable ViT-zoo members:
randomly-initialized torch reference modules (vit_pytorch_diy/{vit_3d,
simple_vit_3d, vivit, cct_3d}.py) are imported via the state-dict
converters and must reproduce the reference logits on the same input.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference not mounted")


def _load_ref(module):
    torch = pytest.importorskip("torch")
    # the zoo package __init__ pulls dino -> torchvision (not installed);
    # the stub needs a real __spec__ or transformers' find_spec probing
    # (importlib.util.find_spec) raises ValueError in later tests
    import importlib.machinery
    import types
    for mod in ("torchvision", "torchvision.transforms"):
        if mod not in sys.modules:
            stub = types.ModuleType(mod)
            stub.__spec__ = importlib.machinery.ModuleSpec(mod, None)
            sys.modules[mod] = stub
    sys.modules["torchvision"].transforms = sys.modules[
        "torchvision.transforms"]
    sys.path.insert(0, "/root/reference")
    try:
        import importlib
        mod = importlib.import_module(f"vit_pytorch_diy.{module}")
    finally:
        sys.path.remove("/root/reference")
    return torch, mod


def _state(torch, model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_vit3d_logit_parity():
    torch, m3d = _load_ref("vit_3d")
    from gfe_mamba_tpu.models.vit_zoo import ViT3D
    from gfe_mamba_tpu.utils.torch_import import import_vit3d

    torch.manual_seed(0)
    ref = m3d.ViT(image_size=16, image_patch_size=8, frames=8,
                  frame_patch_size=4, num_classes=5, dim=32, depth=2,
                  heads=4, mlp_dim=64, channels=2, dim_head=8).eval()
    video = torch.randn(2, 2, 8, 16, 16)  # (b, c, f, h, w)
    with torch.no_grad():
        want = ref(video).numpy()

    model = ViT3D(image_size=(16, 16), image_depth=8, patch_size=8,
                  depth_patch_size=4, num_classes=5, dim=32, depth=2,
                  heads=4, mlp_dim=64, dim_head=8)
    # channels-last volume (b, h, w, f, c): frames land on the z axis
    vol = np.transpose(video.numpy(), (0, 3, 4, 2, 1))
    like = jax.eval_shape(model.init, jax.random.key(0),
                          jnp.asarray(vol))["params"]
    params = import_vit3d(_state(torch, ref), like, grid=(2, 2, 2))
    got = model.apply({"params": params}, jnp.asarray(vol))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_simple_vit3d_logit_parity():
    torch, sv3 = _load_ref("simple_vit_3d")
    from gfe_mamba_tpu.models.vit_zoo_extra import SimpleViT3D
    from gfe_mamba_tpu.utils.torch_import import import_simple_vit3d

    torch.manual_seed(1)
    ref = sv3.SimpleViT(image_size=16, image_patch_size=8, frames=8,
                        frame_patch_size=4, num_classes=3, dim=36, depth=2,
                        heads=3, mlp_dim=72, channels=2, dim_head=12).eval()
    video = torch.randn(2, 2, 8, 16, 16)
    with torch.no_grad():
        want = ref(video).numpy()

    model = SimpleViT3D(image_size=(8, 16, 16), patch_size=(4, 8, 8),
                        num_classes=3, dim=36, depth=2, heads=3,
                        mlp_dim=72, dim_head=12)
    vol = np.transpose(video.numpy(), (0, 2, 3, 4, 1))  # (b, f, h, w, c)
    like = jax.eval_shape(model.init, jax.random.key(0),
                          jnp.asarray(vol))["params"]
    params = import_simple_vit3d(_state(torch, ref), like,
                                 patch=(8, 8, 4, 2))
    got = model.apply({"params": params}, jnp.asarray(vol))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("pool", ["cls", "mean"])
def test_vivit_logit_parity(pool):
    torch, vv = _load_ref("vivit")
    from gfe_mamba_tpu.models.vit_zoo_extra import ViViT
    from gfe_mamba_tpu.utils.torch_import import import_vivit

    torch.manual_seed(2)
    ref = vv.ViT(image_size=16, image_patch_size=8, frames=8,
                 frame_patch_size=4, num_classes=4, dim=32,
                 spatial_depth=2, temporal_depth=1, heads=4, mlp_dim=64,
                 channels=2, dim_head=8, pool=pool).eval()
    video = torch.randn(2, 2, 8, 16, 16)
    with torch.no_grad():
        want = ref(video).numpy()

    model = ViViT(image_size=(16, 16), image_patch_size=(8, 8), frames=8,
                  frame_patch_size=4, num_classes=4, dim=32,
                  spatial_depth=2, temporal_depth=1, heads=4, mlp_dim=64,
                  dim_head=8, pool=pool)
    vol = np.transpose(video.numpy(), (0, 2, 3, 4, 1))
    like = jax.eval_shape(model.init, jax.random.key(0),
                          jnp.asarray(vol))["params"]
    params = import_vivit(_state(torch, ref), like)
    got = model.apply({"params": params}, jnp.asarray(vol))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("posemb", ["learnable", "sine"])
def test_cct3d_logit_parity(posemb):
    torch, c3 = _load_ref("cct_3d")
    from gfe_mamba_tpu.models.vit_zoo_extra import CCT3D
    from gfe_mamba_tpu.utils.torch_import import import_cct

    torch.manual_seed(3)
    ref = c3.CCT(img_size=16, num_frames=8, embedding_dim=32,
                 n_input_channels=2, n_conv_layers=2, kernel_size=3,
                 stride=2, padding=1, num_layers=2, num_heads=4,
                 mlp_ratio=2.0, num_classes=6,
                 positional_embedding=posemb).eval()
    video = torch.randn(2, 2, 8, 16, 16)
    with torch.no_grad():
        want = ref(video).numpy()

    model = CCT3D(num_classes=6, embedding_dim=32, n_conv_layers=2,
                  kernel_size=3, stride=2, num_layers=2, num_heads=4,
                  mlp_ratio=2.0, stochastic_depth=0.1,
                  positional_embedding=posemb)
    vol = np.transpose(video.numpy(), (0, 2, 3, 4, 1))
    like = jax.eval_shape(model.init, jax.random.key(0),
                          jnp.asarray(vol))["params"]
    params = import_cct(_state(torch, ref), like, dims=3)
    got = model.apply({"params": params}, jnp.asarray(vol))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
