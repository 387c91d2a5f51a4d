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
    import importlib.machinery
    for mod in ("torchvision", "torchvision.transforms"):
        if mod not in sys.modules:
            stub = types.ModuleType(mod)
            # real __spec__: transformers probes via find_spec later
            stub.__spec__ = importlib.machinery.ModuleSpec(mod, None)
            sys.modules[mod] = stub
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


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference not mounted")
def test_classifier_logit_parity_with_torch():
    """Cross_mamba_both at a small config: imported weights reproduce
    the torch logits (tiny depth-2 volumes keep the hardcoded
    d_cross=160*160 cross-attention cheap)."""
    torch, _ = _load_reference_generator()
    sys.path.insert(0, "/root/reference")
    try:
        from cross_atten.mamba_transformer import Cross_mamba_both
        from classify.classifier import Combine_classfier_vit_mid
    finally:
        sys.path.remove("/root/reference")
    from gfe_mamba_tpu.models.fusion import CrossMambaBoth
    from gfe_mamba_tpu.models.combiners import CombineClassifierVitMid
    from gfe_mamba_tpu.utils.torch_import import (
        import_classifier, import_combiner,
    )

    torch.manual_seed(0)
    ref = Cross_mamba_both(categories=(3, 5), num_continuous=4, dim=32,
                           depth=1, heads=4, dim_head=8)
    ref.eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = CrossMambaBoth(categories=(3, 5), num_continuous=4, dim=32,
                           depth=1, heads=4, dim_head=8)
    rng = np.random.RandomState(0)
    x_cat = rng.randint(0, 3, (1, 2)).astype(np.int64)
    x_num = rng.randn(1, 4).astype(np.float32)
    feats = rng.randn(1, 2, 32).astype(np.float32)
    mri = rng.randn(1, 1, 160, 160, 2).astype(np.float32)   # torch NCXYZ
    pet = rng.randn(1, 1, 160, 160, 2).astype(np.float32)

    with torch.no_grad():
        ref_logit = ref(torch.from_numpy(x_cat), torch.from_numpy(x_num),
                        torch.from_numpy(feats),
                        [torch.from_numpy(mri), torch.from_numpy(pet)]
                        ).numpy()

    vols = [jnp.asarray(np.moveaxis(mri, 1, -1)),
            jnp.asarray(np.moveaxis(pet, 1, -1))]
    variables = jax.eval_shape(
        model.init, jax.random.key(0), jnp.asarray(x_cat, jnp.int32),
        jnp.asarray(x_num), jnp.asarray(feats), vols)
    params = import_classifier(state, variables["params"])
    got = model.apply({"params": params}, jnp.asarray(x_cat, jnp.int32),
                      jnp.asarray(x_num), jnp.asarray(feats), vols)
    np.testing.assert_allclose(np.asarray(got), ref_logit, rtol=1e-3,
                               atol=1e-4)

    # combiner parity
    torch.manual_seed(1)
    ref_comb = Combine_classfier_vit_mid(seq_length=3).eval()
    comb_state = {k: v.detach().numpy()
                  for k, v in ref_comb.state_dict().items()}
    mid_in = rng.randn(1, 8, 320, 120).astype(np.float32)   # torch NCHW
    mid_out = rng.randn(1, 8, 320, 120).astype(np.float32)
    with torch.no_grad():
        ref_feats = ref_comb(torch.from_numpy(mid_in),
                             torch.from_numpy(mid_out)).numpy()
    comb = CombineClassifierVitMid(seq_length=3)
    cvars = jax.eval_shape(
        comb.init, jax.random.key(0),
        jnp.asarray(np.moveaxis(mid_in, 1, -1)),
        jnp.asarray(np.moveaxis(mid_out, 1, -1)))
    cparams = import_combiner(comb_state, cvars["params"])
    got_feats = comb.apply({"params": cparams},
                           jnp.asarray(np.moveaxis(mid_in, 1, -1)),
                           jnp.asarray(np.moveaxis(mid_out, 1, -1)))
    np.testing.assert_allclose(np.asarray(got_feats), ref_feats,
                               rtol=1e-3, atol=1e-4)
