"""Stage-2 fusion stack tests: cross-attention, FT-transformer models,
Mamba/Jamba fusion heads, combiner, and the end-to-end pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfe_mamba_tpu.models import (
    CrossAttention, SelfAttention, CrossMambaBoth, CrossMambaAblation,
    CrossJambaBoth, CrossTransformerBoth, FTTransformerCross,
    CombineClassifierVitMid, GFEMamba, build_gfe_mamba,
)
from gfe_mamba_tpu.models.ft_transformer import (
    TabularEmbedder, category_offsets, flatten_volume_condition,
)

CATS = (3, 5, 2)
NCONT = 4
DIM = 16


def _tab_inputs(bsz=2, seed=0):
    rng = np.random.RandomState(seed)
    x_cat = jnp.asarray(
        np.stack([rng.randint(0, c, bsz) for c in CATS], 1), jnp.int32)
    x_num = jnp.asarray(rng.randn(bsz, NCONT), jnp.float32)
    return x_cat, x_num


def _volumes(bsz=2, shape=(8, 8, 4), seed=1):
    rng = np.random.RandomState(seed)
    return (jnp.asarray(rng.randn(bsz, *shape, 1), jnp.float32),
            jnp.asarray(rng.randn(bsz, *shape, 1), jnp.float32))


def test_category_offsets():
    np.testing.assert_array_equal(category_offsets((3, 5, 2), 2), [2, 5, 10])
    np.testing.assert_array_equal(category_offsets((7,), 2), [2])


def test_flatten_volume_condition_layout():
    """(B,H,W,D,C) volumes -> (B, D, H*W) slice tokens matching the
    reference 'b c h w d -> (b c) (h w) d' + transpose
    (mamba_transformer.py:91-94)."""
    rng = np.random.RandomState(0)
    mri = rng.randn(2, 4, 5, 3, 1).astype(np.float32)
    pet = rng.randn(2, 4, 5, 3, 1).astype(np.float32)
    cond = flatten_volume_condition([jnp.asarray(mri), jnp.asarray(pet)])
    assert cond.shape == (2, 6, 20)
    # token d of mri: flattened (h, w) plane at depth d
    np.testing.assert_allclose(np.asarray(cond[0, 1]),
                               mri[0, :, :, 1, 0].reshape(-1))
    np.testing.assert_allclose(np.asarray(cond[0, 3]),
                               pet[0, :, :, 0, 0].reshape(-1))


def test_cross_attention_shapes():
    x = jnp.ones((2, 1, DIM))
    y = jnp.ones((2, 6, 80))
    m = CrossAttention(n_heads=2, d_embed=DIM)
    out = m.apply(m.init(jax.random.key(0), x, y), x, y)
    assert out.shape == (2, 1, DIM)


def test_self_attention_causal():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 6, DIM), jnp.float32)
    m = SelfAttention(n_heads=2)
    params = m.init(jax.random.key(0), x)
    y1 = m.apply(params, x, causal_mask=True)
    y2 = m.apply(params, x.at[:, 4:].set(0.0), causal_mask=True)
    np.testing.assert_allclose(np.asarray(y1[:, :4]), np.asarray(y2[:, :4]),
                               rtol=1e-4, atol=1e-5)


def test_tabular_embedder_tokens():
    x_cat, x_num = _tab_inputs()
    m = TabularEmbedder(CATS, NCONT, DIM)
    tokens = m.apply(m.init(jax.random.key(0), x_cat, x_num), x_cat, x_num)
    # CLS + 3 categorical + 4 numerical
    assert tokens.shape == (2, 1 + len(CATS) + NCONT, DIM)


def test_combiner_vit_mid():
    mid_in = jnp.ones((2, 8, 6, 8))
    mid_out = jnp.ones((2, 8, 6, 8))
    m = CombineClassifierVitMid(seq_length=4)
    feats = m.apply(m.init(jax.random.key(0), mid_in, mid_out),
                    mid_in, mid_out)
    assert feats.shape == (2, 4, 16)


def _fusion_kwargs():
    return dict(categories=CATS, num_continuous=NCONT, dim=DIM, depth=1,
                heads=2, dim_head=8)


def test_cross_mamba_both_forward():
    x_cat, x_num = _tab_inputs()
    feats = jnp.ones((2, 4, DIM))
    vols = _volumes()
    m = CrossMambaBoth(**_fusion_kwargs())
    params = m.init(jax.random.key(0), x_cat, x_num, feats, vols)
    logits = m.apply(params, x_cat, x_num, feats, vols)
    assert logits.shape == (2, 1)


def test_cross_mamba_ablation_paths():
    x_cat, x_num = _tab_inputs()
    feats = jnp.ones((2, 4, DIM))
    vols = _volumes()
    m = CrossMambaAblation(**_fusion_kwargs())
    params = m.init(jax.random.key(0), x_cat, x_num, feats, vols)
    full = m.apply(params, x_cat, x_num, feats, vols)
    no_img_feat = m.apply(params, x_cat, x_num, None, vols)
    no_cond = m.apply(params, x_cat, x_num, feats, None)
    no_table = m.apply(params, x_cat, x_num, feats, vols, no_table=True)
    for out in (full, no_img_feat, no_cond, no_table):
        assert out.shape == (2, 1)


def test_cross_transformer_both_forward():
    x_cat, x_num = _tab_inputs()
    feats = jnp.ones((2, 4, DIM))
    vols = _volumes()
    m = CrossTransformerBoth(**_fusion_kwargs())
    params = m.init(jax.random.key(0), x_cat, x_num, feats, vols)
    assert m.apply(params, x_cat, x_num, feats, vols).shape == (2, 1)


def test_ft_transformer_cross_forward():
    x_cat, x_num = _tab_inputs()
    cond = jnp.ones((2, 6, 48))
    m = FTTransformerCross(**_fusion_kwargs())
    params = m.init(jax.random.key(0), x_cat, x_num, cond)
    assert m.apply(params, x_cat, x_num, cond).shape == (2, 1)


def test_cross_jamba_both_forward():
    x_cat, x_num = _tab_inputs()
    feats = jnp.ones((2, 4, DIM))
    vols = _volumes()
    m = CrossJambaBoth(**_fusion_kwargs(), num_experts=2,
                       num_experts_per_tok=2)
    params = m.init(jax.random.key(0), x_cat, x_num, feats, vols)
    assert m.apply(params, x_cat, x_num, feats, vols).shape == (2, 1)


def test_full_pipeline_forward_and_grads():
    """Minimum end-to-end slice (SURVEY.md build step 4): generator ->
    combiner -> tabular embed -> Mamba -> cross-attention -> logit,
    jitted, with gradients flowing to combiner+classifier."""
    model = build_gfe_mamba(
        categories=CATS, num_continuous=NCONT, dim=2 * 16, depth=1, heads=2,
        seq_length=3, f_maps=(4, 8, 16), layer_order="cge",
        fold_factor=2, vit_patch_size=4, vit_dim=16, vit_depth=1,
        vit_heads=2, vit_mlp_dim=32,
    )
    x_cat, x_num = _tab_inputs()
    mri = jnp.asarray(np.random.RandomState(2).randn(2, 16, 16, 8, 1),
                      jnp.float32)
    params = model.init(jax.random.key(0), mri, x_cat, x_num)

    logits, pet = jax.jit(
        lambda p, m, c, n: model.apply(p, m, c, n, return_pet=True)
    )(params, mri, x_cat, x_num)
    assert logits.shape == (2, 1)
    assert pet.shape == mri.shape

    def loss_fn(p):
        out = model.apply(p, mri, x_cat, x_num)
        return jnp.mean(out ** 2)

    grads = jax.grad(loss_fn)(params)
    # classifier + combiner must receive gradients (generator is frozen
    # by the optimizer mask at train time, but grads still flow)
    g_comb = grads["params"]["combiner"]["vit_mid_linear"]["kernel"]
    assert float(jnp.abs(g_comb).sum()) > 0
    g_cls = grads["params"]["classifier"]["to_logits"]["Dense_0"]["kernel"]
    assert float(jnp.abs(g_cls).sum()) > 0


def test_legacy_combiners():
    """Legacy pyramid combiner family (classifier.py:144-370)."""
    from gfe_mamba_tpu.models.combiners import (
        CombineClassifier, CombineClassifierCross, CombineClassifierEmb,
        CombineClassifierFused, CombinePyramid,
    )
    rng = np.random.RandomState(0)
    # skip features at 1x and 1/2x resolution (f_maps 8, 16); the
    # 5-level pyramid needs >=64^3 inputs to avoid degenerate pools
    enc = [jnp.asarray(rng.randn(1, 64, 64, 64, 8), jnp.float32),
           jnp.asarray(rng.randn(1, 32, 32, 32, 16), jnp.float32)]
    dec = [jnp.asarray(rng.randn(1, 64, 64, 64, 8), jnp.float32),
           jnp.asarray(rng.randn(1, 32, 32, 32, 16), jnp.float32)]

    m = CombineClassifier(latent_dim=4)
    out = m.apply(m.init(jax.random.key(0), enc, dec), enc, dec)
    assert out.shape == (1, 1)

    m = CombineClassifierCross(latent_dim=4)
    out = m.apply(m.init(jax.random.key(0), enc, dec), enc, dec)
    assert out.shape[0] == 1 and out.shape[1] == 4  # (B, latent, voxels)

    m = CombineClassifierEmb(latent_dim=4, patch_size=8, embed_dim=32)
    out = m.apply(m.init(jax.random.key(0), enc, dec), enc, dec)
    assert out.shape == (1, (32 // 8) ** 3, 32)

    # external FT feature must match the pyramid descriptor width
    ft = jnp.ones((1, 1, 4), jnp.float32)
    m = CombineClassifierFused(latent_dim=4)
    out = m.apply(m.init(jax.random.key(0), enc, dec, ft), enc, dec, ft)
    assert out.shape == (1, 1)

    m = CombinePyramid(latent_dim=4)
    out = m.apply(m.init(jax.random.key(0), enc, dec), enc, dec)
    assert out.ndim == 3


def test_combine_classifier_2_and_3():
    """Combine_classfier_2/_3 (classifier.py:286-325, 335-370): exact
    channel widths, token layouts, and full gradient flow."""
    from gfe_mamba_tpu.models.combiners import (
        CombineClassifier2, CombineClassifier3,
    )
    rng = np.random.RandomState(1)
    enc = [jnp.asarray(rng.randn(2, 64, 64, 64, 8), jnp.float32),
           jnp.asarray(rng.randn(2, 32, 32, 32, 16), jnp.float32)]
    dec = [jnp.asarray(rng.randn(2, 64, 64, 64, 8), jnp.float32),
           jnp.asarray(rng.randn(2, 32, 32, 32, 16), jnp.float32)]

    # _2: constant-width pyramid -> one flat descriptor token (B, 1, N)
    m2 = CombineClassifier2(latent_dim=4)
    vars2 = m2.init(jax.random.key(0), enc, dec)
    out2 = m2.apply(vars2, enc, dec)
    assert out2.shape[:2] == (2, 1) and out2.shape[2] % 4 == 0
    # pyramid widths: every conv stays latent_dim wide (classifier.py:
    # 296-298)
    p2 = vars2["params"]
    for conv in ("feature3_conv", "feature4_conv", "feature5_conv"):
        assert p2[conv]["conv"]["kernel"].shape[-1] == 4, conv

    # _3: widening pyramid -> (B, voxels, latent*4) token sequence
    m3 = CombineClassifier3(latent_dim=4)
    vars3 = m3.init(jax.random.key(0), enc, dec)
    out3 = m3.apply(vars3, enc, dec)
    assert out3.ndim == 3 and out3.shape[0] == 2 and out3.shape[2] == 16
    p3 = vars3["params"]
    assert p3["feature3_conv"]["conv"]["kernel"].shape[-1] == 8
    assert p3["feature4_conv"]["conv"]["kernel"].shape[-1] == 16
    assert p3["feature5_conv"]["conv"]["kernel"].shape[-1] == 16

    # gradient flow: every parameter receives gradient (reference's
    # assert-by-print convention, classifier.py:374-385)
    def loss(p):
        return jnp.sum(m2.apply({"params": p}, enc, dec) ** 2)

    grads = jax.grad(loss)(p2)
    for path, leaf in jax.tree_util.tree_flatten_with_path(grads)[0]:
        assert float(jnp.abs(leaf).sum()) > 0, path
