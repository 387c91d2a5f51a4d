"""Logit-parity golden test: a randomly initialized torch reference
generator, imported into the flax model, must produce the SAME outputs
on the same input (eval mode, exact_reference_upsample)."""

import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfe_mamba_tpu.models.unet3d import ResidualMidUNet3DViT
from gfe_mamba_tpu.utils.torch_import import import_generator


def _load_reference_generator():
    torch = pytest.importorskip("torch")
    for mod in ("torchvision", "torchvision.transforms"):
        sys.modules.setdefault(mod, types.ModuleType(mod))
    sys.modules["torchvision"].transforms = sys.modules[
        "torchvision.transforms"]
    sys.path.insert(0, "/root/reference")
    try:
        from pytorch3dunet.unet3d.model import Residual_mid_UNet3D_vit
    finally:
        sys.path.remove("/root/reference")
    return torch, Residual_mid_UNet3D_vit


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference not mounted")
def test_generator_logit_parity_with_torch():
    torch, RefGen = _load_reference_generator()
    torch.manual_seed(0)
    # full canonical architecture at reduced spatial size: the depth-fold
    # needs first-spatial divisible by 4*8 and the ViT patches 40 --
    # use (80, 80, 48): bottleneck (20, 20, 12) folds (m1=4... )
    # -> instead keep the canonical (160,160,96) geometry but a thin
    # config is impossible (ViT dims are hardcoded in the reference), so
    # run the true canonical model once on a single small batch.
    ref = RefGen(1, 1, is_segmentation=False, f_maps=(64, 128, 256))
    ref.eval()

    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = ResidualMidUNet3DViT(1, 1, is_segmentation=False,
                                 f_maps=(64, 128, 256),
                                 exact_reference_upsample=True)
    x = np.random.RandomState(0).randn(1, 160, 160, 96, 1).astype(np.float32)
    variables = jax.eval_shape(model.init, jax.random.key(0),
                               jnp.asarray(x))
    params = import_generator(state, variables["params"])

    with torch.no_grad():
        # torch layout: (B, C, X, Y, Z)
        ref_out = ref(torch.from_numpy(
            np.transpose(x, (0, 4, 1, 2, 3)))).numpy()
    got = model.apply({"params": params}, jnp.asarray(x))
    got_t = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))

    np.testing.assert_allclose(got_t, ref_out, rtol=2e-2, atol=2e-3)
    # tight check on central region (away from any boundary-convention
    # differences)
    np.testing.assert_allclose(got_t[..., 40:120, 40:120, 24:72],
                               ref_out[..., 40:120, 40:120, 24:72],
                               rtol=2e-2, atol=1e-3)
