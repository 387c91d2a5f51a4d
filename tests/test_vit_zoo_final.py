"""Tests for the final ViT-zoo batch (vit_zoo_final.py): ATS / RvT /
NaViT / SimMIM / MP3 / distillation / learnable-memory / EsViT /
MaxViT-with-registers / extract & record utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfe_mamba_tpu.models.vit_zoo import ClassifierViT
from gfe_mamba_tpu.models.vit_zoo_final import (
    ATSViT,
    DistillableViT,
    DistillWrapper,
    EsViTProjector,
    MaxViTWithRegisters,
    MemoryAdapter,
    MemoryViT,
    MP3,
    MP3ViT,
    NaViT,
    RvT,
    SimMIM,
    distill_loss,
    esvit_center_update,
    esvit_region_loss,
    esvit_view_loss,
    extract,
    group_images_by_max_seq_len,
    pack_images,
    record_attention,
)


def test_ats_vit_samples_and_classifies():
    model = ATSViT(image_size=16, patch_size=4, num_classes=3, dim=32,
                   depth=3, max_tokens_per_depth=(12, 6, 6), heads=2,
                   mlp_dim=64, dim_head=16)
    img = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 3)),
                      jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)}
    params = model.init(rngs, img)
    logits, token_ids = model.apply(
        params, img, return_sampled_token_ids=True,
        rngs={"gumbel": jax.random.PRNGKey(2)})
    assert logits.shape == (2, 3)
    # after two sampling layers the static token count is 6 (+CLS)
    assert token_ids.shape == (2, 6)
    ids = np.asarray(token_ids)
    assert ids.min() >= -1 and ids.max() < 16
    for row in ids:
        kept = row[row >= 0]
        assert len(set(kept.tolist())) == len(kept)  # dedup worked


def test_ats_vit_jits():
    model = ATSViT(image_size=16, patch_size=4, num_classes=2, dim=16,
                   depth=2, max_tokens_per_depth=(8, 4), heads=2,
                   mlp_dim=32, dim_head=8)
    img = jnp.zeros((1, 16, 16, 1))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        img)
    fn = jax.jit(lambda p, x, k: model.apply(p, x, rngs={"gumbel": k}))
    out = fn(params, img, jax.random.PRNGKey(3))
    assert np.isfinite(np.asarray(out)).all()


def test_rvt_forward():
    model = RvT(image_size=16, patch_size=4, num_classes=4, dim=32,
                depth=2, heads=2, mlp_dim=64, dim_head=16)
    img = jnp.asarray(np.random.default_rng(1).normal(size=(2, 16, 16, 3)),
                      jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(params, img)
    assert out.shape == (2, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_navit_packing_and_forward():
    rng = np.random.default_rng(2)
    images = [rng.normal(size=(8, 8, 3)).astype(np.float32),
              rng.normal(size=(16, 8, 3)).astype(np.float32),
              rng.normal(size=(8, 16, 3)).astype(np.float32)]
    groups = group_images_by_max_seq_len(images, patch_size=4,
                                         max_seq_len=12)
    assert [len(g) for g in groups] == [2, 1]
    packed = pack_images(groups, patch_size=4, max_seq_len=12)
    assert packed["patches"].shape == (2, 12, 48)
    assert packed["mask"][0].sum() == 12 and packed["mask"][1].sum() == 8

    model = NaViT(image_size=16, patch_size=4, num_classes=3, dim=32,
                  depth=2, heads=2, mlp_dim=64, max_images=2, dim_head=16)
    args = [jnp.asarray(packed[k]) for k in
            ("patches", "positions", "image_ids", "mask")]
    params = model.init(jax.random.PRNGKey(0), *args)
    logits, valid = model.apply(params, *args)
    assert logits.shape == (2, 2, 3)
    np.testing.assert_array_equal(np.asarray(valid),
                                  [[True, True], [True, False]])

    # padding tokens must not influence the logits
    patches2 = packed["patches"].copy()
    patches2[1, 8:] = 123.0
    logits2, _ = model.apply(params, jnp.asarray(patches2), *args[1:])
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2),
                               atol=1e-5)


def test_simmim_loss_and_grads():
    model = SimMIM(image_size=16, patch_size=4, dim=32, depth=1, heads=2,
                   mlp_dim=64, masking_ratio=0.5, dim_head=16)
    img = jnp.asarray(np.random.default_rng(3).normal(size=(2, 16, 16, 1)),
                      jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img, jax.random.PRNGKey(1))
    loss, grads = jax.value_and_grad(
        lambda p: model.apply(p, img, jax.random.PRNGKey(2)))(params)
    assert np.isfinite(float(loss))
    norms = jax.tree_util.tree_map(lambda g: float(jnp.abs(g).sum()), grads)
    assert any(v > 0 for v in jax.tree_util.tree_leaves(norms))


def test_mp3_pretrain_and_classify():
    vit = MP3ViT(image_size=16, patch_size=4, num_classes=5, dim=32,
                 depth=2, heads=2, mlp_dim=64, dim_head=16)
    img = jnp.asarray(np.random.default_rng(4).normal(size=(2, 16, 16, 3)),
                      jnp.float32)
    params = vit.init(jax.random.PRNGKey(0), img)
    assert vit.apply(params, img).shape == (2, 5)

    mp3 = MP3(vit=vit, masking_ratio=0.5)
    p2 = mp3.init(jax.random.PRNGKey(0), img, jax.random.PRNGKey(1))
    loss = mp3.apply(p2, img, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_distillation():
    student = DistillableViT(image_size=16, patch_size=4, num_classes=4,
                             dim=32, depth=2, heads=2, mlp_dim=64,
                             dim_head=16)
    img = jnp.asarray(np.random.default_rng(5).normal(size=(2, 16, 16, 3)),
                      jnp.float32)
    params = student.init(jax.random.PRNGKey(0), img)
    plain = student.apply(params, img)
    assert plain.shape == (2, 4)

    labels = jnp.array([1, 3])
    teacher_logits = jnp.asarray(
        np.random.default_rng(6).normal(size=(2, 4)), jnp.float32)
    for hard in (False, True):
        wrapper = DistillWrapper(student=student, temperature=2.0,
                                 alpha=0.5, hard=hard)
        wp = wrapper.init(jax.random.PRNGKey(0), img, labels, teacher_logits)
        loss = wrapper.apply(wp, img, labels, teacher_logits)
        assert np.isfinite(float(loss))


def test_distill_loss_hard_matches_ce_on_teacher_argmax():
    s = jnp.asarray([[2.0, 0.0], [0.0, 2.0]])
    t = jnp.asarray([[5.0, 0.0], [0.0, 5.0]])
    labels = jnp.array([0, 1])
    # distill token logits equal to student: hard loss == plain CE
    full = distill_loss(s, s, t, labels, alpha=0.5, hard=True)
    ce = -jnp.mean(jnp.take_along_axis(jax.nn.log_softmax(s, -1),
                                       labels[:, None], -1))
    np.testing.assert_allclose(float(full), float(ce), rtol=1e-6)


def test_memory_adapter():
    vit = MemoryViT(image_size=16, patch_size=4, num_classes=3, dim=32,
                    depth=2, heads=2, mlp_dim=64, dim_head=16)
    img = jnp.asarray(np.random.default_rng(7).normal(size=(2, 16, 16, 3)),
                      jnp.float32)
    vparams = vit.init(jax.random.PRNGKey(0), img)
    assert vit.apply(vparams, img).shape == (2, 3)

    adapter = MemoryAdapter(vit=vit, num_memories_per_layer=4,
                            num_classes=2)
    aparams = adapter.init(jax.random.PRNGKey(1), img)
    out = adapter.apply(aparams, img)
    assert out.shape == (2, 2)
    assert "memories_per_layer" in aparams["params"]
    assert aparams["params"]["memories_per_layer"].shape == (2, 4, 32)


def test_esvit_losses():
    proj = EsViTProjector(dim_out=8, num_layers=3, hidden_size=16)
    x = jnp.asarray(np.random.default_rng(8).normal(size=(2, 12)),
                    jnp.float32)
    params = proj.init(jax.random.PRNGKey(0), x)
    assert proj.apply(params, x).shape == (2, 8)

    centers = jnp.zeros((1, 8))
    t_logits = jnp.asarray(np.random.default_rng(9).normal(size=(2, 8)),
                           jnp.float32)
    s_logits = jnp.asarray(np.random.default_rng(10).normal(size=(2, 8)),
                           jnp.float32)
    vl = esvit_view_loss(t_logits, s_logits, centers)
    assert np.isfinite(float(vl)) and float(vl) > 0

    # orthonormal identical latents -> each region matches itself
    eye = jnp.eye(3)[None].repeat(2, axis=0)              # (2, 3, 3)
    tr = jnp.asarray(np.random.default_rng(11).normal(size=(2, 3, 8)),
                     jnp.float32)
    sr = jnp.asarray(np.random.default_rng(12).normal(size=(2, 3, 8)),
                     jnp.float32)
    rl = esvit_region_loss(tr, sr, eye, eye, centers)
    t = jax.nn.softmax((tr - centers) / 0.04, -1)
    s = jax.nn.softmax(sr / 0.9, -1)
    expected = -jnp.mean(jnp.sum(t * jnp.log(s + 1e-20), axis=-1))
    np.testing.assert_allclose(float(rl), float(expected), rtol=1e-5)

    c2 = esvit_center_update(jnp.ones(4), jnp.zeros(4), momentum=0.75)
    np.testing.assert_allclose(np.asarray(c2), 0.75)


def test_maxvit_with_registers():
    model = MaxViTWithRegisters(num_classes=3, dim=32, depth=(1, 1),
                                dim_head=16, window_size=7, dropout=0.0,
                                num_register_tokens=2)
    img = jnp.asarray(np.random.default_rng(13).normal(size=(1, 56, 56, 3)),
                      jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(params, img)
    assert out.shape == (1, 3)
    assert np.isfinite(np.asarray(out)).all()
    # shared bias row: table has (2w-1)^2 + 1 entries
    table = params["params"]["s0_b0_block_attn"]["rel_pos_bias"]
    assert table.shape == (13 * 13 + 1, 2)


def test_extract_and_record_attention():
    model = ClassifierViT(image_size=16, patch_size=4, num_classes=2,
                          dim=32, depth=2, heads=2, mlp_dim=64, dim_head=16)
    img = jnp.asarray(np.random.default_rng(14).normal(size=(2, 16, 16, 3)),
                      jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img)

    logits, latent = extract(model, params, img)
    assert logits.shape == (2, 2)
    assert latent.shape == (2, 17, 32)       # 16 patches + CLS

    logits2, attns = record_attention(model, params, img)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2))
    assert attns.shape == (2, 2, 2, 17, 17)  # (b, layers, heads, n, n)
    np.testing.assert_allclose(np.asarray(attns.sum(-1)), 1.0, atol=1e-5)
