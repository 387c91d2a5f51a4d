"""Round-3 hierarchical ViT zoo members (vit_zoo_hier.py): forward
shapes, position-bias table semantics, and the reference quirks
(RegionViT weight sharing, LeViT absolute-distance bias)."""

import jax
import jax.numpy as jnp
import numpy as np

from gfe_mamba_tpu.models.vit_zoo_hier import (
    CrossFormer,
    LeViT,
    MaxViT,
    RegionViT,
    ScalableViT,
    SepViT,
    TwinsSVT,
    XCiT,
    _crossformer_bias_tables,
    _levit_pos_indices,
    _region_local_bias_indices,
)


def _init_apply(model, x):
    variables = model.init(jax.random.key(0), x)
    return variables, model.apply(variables, x)


def test_levit_shapes_and_distill():
    m = LeViT(image_size=32, num_classes=3, dim=(32, 48, 64), depth=1,
              heads=(2, 3, 4), num_distill_classes=5)
    v, out = _init_apply(m, jnp.ones((2, 32, 32, 3)))
    assert isinstance(out, tuple)
    assert out[0].shape == (2, 3) and out[1].shape == (2, 5)
    # distill head is optional (levit.py:162: exists iff configured)
    m2 = LeViT(image_size=32, num_classes=3, dim=(32, 48, 64), depth=1,
               heads=(2, 3, 4))
    _, out2 = _init_apply(m2, jnp.ones((2, 32, 32, 3)))
    assert out2.shape == (2, 3)


def test_levit_pos_indices():
    # levit.py:71-83: bias index is |dx|*fmap + |dy| -> symmetric when
    # queries == keys (no downsample), in-range for the (fmap^2,) table
    idx = _levit_pos_indices(4, downsample=False)
    assert idx.shape == (16, 16)
    np.testing.assert_array_equal(idx, idx.T)
    assert idx.max() < 16 and idx.min() == 0
    # downsampled queries stride 2: q grid 2x2 vs k grid 4x4
    idx_d = _levit_pos_indices(4, downsample=True)
    assert idx_d.shape == (4, 16)


def test_maxvit_shapes():
    m = MaxViT(num_classes=3, dim=32, depth=(1, 1), window_size=2)
    _, out = _init_apply(m, jnp.ones((2, 32, 32, 3)))
    assert out.shape == (2, 3)


def test_twins_svt_shapes():
    m = TwinsSVT(num_classes=3, embed_dims=(16, 32, 48, 64),
                 depths=(1, 1, 1, 1), local_patch_sizes=(2, 2, 2, 2),
                 global_ks=(2, 2, 2, 2), heads=2, dim_head=16)
    _, out = _init_apply(m, jnp.ones((2, 32, 32, 3)))
    assert out.shape == (2, 3)


def test_xcit_shapes():
    m = XCiT(image_size=16, patch_size=4, num_classes=3, dim=32, depth=1,
             cls_depth=1, heads=2, mlp_dim=48)
    _, out = _init_apply(m, jnp.ones((2, 16, 16, 3)))
    assert out.shape == (2, 3)


def test_crossformer_bias_tables():
    # crossformer.py:110-117,146-150: coords span (-w..w)^2 = (2w+1)^2
    # rows; the index math uses stride 2w-1.  The mapping must stay
    # in-range and be injective on distinct displacements (it is part
    # of the trained function even though scrambled).
    for w in (2, 3, 4):
        coords, idx = _crossformer_bias_tables(w)
        assert coords.shape == ((2 * w + 1) ** 2, 2)
        assert idx.shape == (w * w, w * w)
        assert idx.min() >= 0 and idx.max() < len(coords)
        grid = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                    indexing="ij"), 0).reshape(2, -1)
        rel = grid[:, :, None] - grid[:, None, :]
        disp = {}
        for i in range(w * w):
            for j in range(w * w):
                key = (rel[0, i, j], rel[1, i, j])
                assert disp.setdefault(key, idx[i, j]) == idx[i, j]
        assert len(set(disp.values())) == len(disp)


def test_crossformer_shapes():
    m = CrossFormer(num_classes=3, dim=(32, 64, 96, 128),
                    depth=(1, 1, 1, 1), global_window_size=(2, 2, 1, 1),
                    local_window_size=2)
    _, out = _init_apply(m, jnp.ones((2, 64, 64, 3)))
    assert out.shape == (2, 3)


def test_regionvit_weight_sharing_and_shapes():
    m = RegionViT(num_classes=3, dim=(16, 32, 48, 64), depth=(1, 1, 1, 1),
                  window_size=2, local_patch_size=2)
    v, out = _init_apply(m, jnp.ones((2, 32, 32, 3)))
    assert out.shape == (2, 3)
    names = str(jax.tree_util.tree_structure(v))
    # regionvit.py:152-164: ONE attention instance per layer serves both
    # the regional self-attention and the joint region+local pass
    assert "l0_attn" in names and "l0_attn_1" not in names
    # regionvit.py:264-265: ONE downsample conv serves both streams
    assert "s1_down" in names and "s1_down_1" not in names


def test_region_local_bias_indices():
    idx = _region_local_bias_indices(2, 2, 2)
    assert idx.shape == (4, 4)
    assert idx.min() >= 0 and idx.max() < 9  # (2w-1)^2 table


def test_scalable_vit_shapes():
    m = ScalableViT(num_classes=3, dim=16, depth=(1, 1), heads=(2, 2),
                    reduction_factor=(2, 1), window_size=(2, 2))
    _, out = _init_apply(m, jnp.ones((2, 32, 32, 3)))
    assert out.shape == (2, 3)


def test_sepvit_shapes_and_grad_flow():
    m = SepViT(num_classes=3, dim=16, depth=(1, 1), heads=(2, 2),
               window_size=2)
    x = jnp.linspace(0, 1, 2 * 32 * 32 * 3).reshape(2, 32, 32, 3)
    v, out = _init_apply(m, x)
    assert out.shape == (2, 3)

    # reference-style gradient-flow check (sd_cross_atten.py:72-95
    # pattern): every parameter receives a gradient
    def loss(params):
        return m.apply({"params": params}, x).sum()

    grads = jax.grad(loss)(v["params"])
    flat = jax.tree_util.tree_leaves_with_path(grads)
    assert flat
    for path, g in flat:
        assert np.all(np.isfinite(np.asarray(g))), path
    nonzero = [float(np.abs(np.asarray(g)).max()) > 0 for _, g in flat]
    assert sum(nonzero) >= len(nonzero) - 2  # zero-init scales may be 0
