"""Segmentation stack tests: losses vs golden values, slicers,
sliding-window reconstruction identity, transforms, HDF5 dataset."""

import jax.numpy as jnp
import numpy as np
import pytest

from gfe_mamba_tpu.segmentation.losses import (
    bce_dice_loss, cross_entropy_loss, dice_loss, generalized_dice_loss,
    get_loss_criterion, weighted_cross_entropy_loss,
)
from gfe_mamba_tpu.segmentation.metrics import (
    dice_coefficient, get_evaluation_metric, instance_scores, mean_iou, psnr,
)
from gfe_mamba_tpu.segmentation.slicers import FilterSliceBuilder, SliceBuilder
from gfe_mamba_tpu.segmentation.predictor import sliding_window_predict
from gfe_mamba_tpu.segmentation.transforms import build_transforms


def test_dice_loss_perfect_and_disjoint():
    t = jnp.zeros((1, 4, 4, 4, 1)).at[:, :2].set(1.0)
    # logits large -> sigmoid ~ target
    perfect = dice_loss(jnp.where(t > 0, 20.0, -20.0), t)
    assert float(perfect) < 1e-3
    disjoint = dice_loss(jnp.where(t > 0, -20.0, 20.0), t)
    assert float(disjoint) > 0.99


def test_generalized_dice_binary():
    t = jnp.zeros((1, 4, 4, 4, 1)).at[:, :1].set(1.0)
    good = generalized_dice_loss(jnp.where(t > 0, 20.0, -20.0), t)
    bad = generalized_dice_loss(-jnp.where(t > 0, 20.0, -20.0), t)
    assert float(good) < 0.01 < float(bad)


def test_cross_entropy_with_ignore_index():
    logits = jnp.asarray([[[2.0, 0.0], [0.0, 2.0]]])  # (1, 2, C=2)
    target = jnp.asarray([[0, 1]])
    full = cross_entropy_loss(logits, target)
    ignored = cross_entropy_loss(logits, jnp.asarray([[0, -1]]),
                                 ignore_index=-1)
    np.testing.assert_allclose(float(full), float(ignored), atol=1e-6)
    wce = weighted_cross_entropy_loss(logits, target)
    assert np.isfinite(float(wce))


def test_loss_factory():
    fn = get_loss_criterion({"loss": {"name": "BCEDiceLoss"}})
    t = jnp.ones((1, 2, 2, 2, 1))
    assert np.isfinite(float(fn(jnp.zeros_like(t), t)))
    with pytest.raises(ValueError):
        get_loss_criterion({"loss": {"name": "NoSuchLoss"}})
    # skip_last_target wrapper
    fn2 = get_loss_criterion({"loss": {"name": "DiceLoss",
                                       "skip_last_target": True}})
    t2 = jnp.ones((1, 2, 2, 2, 2))
    out = fn2(jnp.zeros((1, 2, 2, 2, 1)), t2)
    assert np.isfinite(float(out))


def test_metrics_factory_and_values():
    pred = jnp.zeros((1, 4, 4, 4, 1)).at[:, :2].set(1.0)
    assert float(dice_coefficient(pred, pred)) > 0.999
    assert float(mean_iou(pred, pred)) == 1.0
    assert float(psnr(pred, pred)) > 50
    fn = get_evaluation_metric({"eval_metric": {"name": "MeanIoU"}})
    assert float(fn(pred, pred)) == 1.0


def test_instance_scores():
    gt = np.zeros((12, 12, 4))
    gt[1:4, 1:4] = 1
    gt[7:10, 7:10] = 1
    perfect = instance_scores(gt, gt)
    assert perfect["f1"] == 1.0
    half = gt.copy()
    half[7:10, 7:10] = 0  # miss one instance
    scores = instance_scores(half, gt)
    assert scores["recall"] == 0.5 and scores["precision"] == 1.0


def test_slice_builder_covers_volume():
    sb = SliceBuilder((10, 10, 6), (4, 4, 4), (3, 3, 2))
    covered = np.zeros((10, 10, 6), bool)
    for sl in sb.raw_slices:
        covered[sl] = True
    assert covered.all()
    # filtered: empty label drops almost everything
    fsb = FilterSliceBuilder((10, 10, 6), (4, 4, 4), (3, 3, 2),
                             label=np.zeros((10, 10, 6)), threshold=0.5,
                             slack_acceptance=0.0)
    assert len(fsb) == 0


def test_sliding_window_identity():
    """Identity model -> reconstruction equals input, regardless of
    overlap (the overlap-count normalization, predictor.py:150-168)."""
    rng = np.random.RandomState(0)
    vol = rng.rand(10, 10, 6, 1).astype(np.float32)
    out = sliding_window_predict(lambda x: x, vol, (4, 4, 4), (2, 2, 2),
                                 out_channels=1, batch_size=3)
    np.testing.assert_allclose(out, vol, rtol=1e-6)


def test_sliding_window_halo():
    rng = np.random.RandomState(1)
    vol = rng.rand(8, 8, 4, 1).astype(np.float32)
    out = sliding_window_predict(lambda x: x, vol, (4, 4, 4), (4, 4, 2),
                                 halo_shape=(2, 2, 0), out_channels=1)
    np.testing.assert_allclose(out, vol, rtol=1e-6)


def test_transforms_pipeline():
    pipe = build_transforms([
        {"name": "RandomFlip"},
        {"name": "RandomRotate90"},
        {"name": "Standardize"},
        {"name": "ToTensor"},
    ], seed=3)
    vol = np.random.RandomState(2).rand(6, 6, 4).astype(np.float64)
    out = pipe(vol)
    assert out.dtype == np.float32
    assert out.shape == (6, 6, 4, 1) or out.shape == (6, 6, 4, 1)


def test_transforms_determinism_and_normalize():
    a = build_transforms([{"name": "RandomFlip"}], seed=5)(
        np.arange(27.0).reshape(3, 3, 3))
    b = build_transforms([{"name": "RandomFlip"}], seed=5)(
        np.arange(27.0).reshape(3, 3, 3))
    np.testing.assert_array_equal(a, b)
    n = build_transforms([{"name": "Normalize"}])(np.arange(8.0).reshape(2, 2, 2))
    assert n.min() == -1.0 and n.max() == 1.0


def test_hdf5_dataset(tmp_path):
    h5py = pytest.importorskip("h5py")
    path = str(tmp_path / "vol.h5")
    rng = np.random.RandomState(0)
    with h5py.File(path, "w") as f:
        f.create_dataset("raw", data=rng.rand(10, 10, 6))
        f.create_dataset("label", data=(rng.rand(10, 10, 6) > 0.5))
    from gfe_mamba_tpu.segmentation.hdf5 import HDF5Dataset
    ds = HDF5Dataset(path, "train",
                     {"patch_shape": (4, 4, 4), "stride_shape": (3, 3, 2)})
    assert len(ds) > 0
    item = ds[0]
    assert item["raw"].shape == (4, 4, 4, 1)
    assert item["label"].shape == (4, 4, 4, 1)
    lazy = HDF5Dataset(path, "train",
                       {"patch_shape": (4, 4, 4), "stride_shape": (3, 3, 2)},
                       lazy=True)
    np.testing.assert_allclose(lazy[0]["raw"], item["raw"])


# ---------------------------------------------------------------------------
# Adapted Rand error family (reference metrics.py:107-257)

def _brute_force_rand(t, s):
    """Pair-counting ground truth for adapted_rand_error."""
    t, s = np.asarray(t).ravel(), np.asarray(s).ravel()
    co = same_t = same_s = 0
    n = len(t)
    for i in range(n):
        for j in range(i + 1, n):
            st, ss = t[i] == t[j], s[i] == s[j]
            same_t += st
            same_s += ss
            co += st and ss
    prec = co / same_s if same_s else 0.0
    rec = co / same_t if same_t else 0.0
    f = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return 1.0 - f, prec, rec


def test_adapted_rand_error_golden():
    from gfe_mamba_tpu.segmentation.metrics import adapted_rand_error
    rng = np.random.RandomState(0)
    for trial in range(3):
        t = rng.randint(0, 4, size=40)
        s = rng.randint(0, 3, size=40)
        are, p, r = adapted_rand_error(t, s)
        are_bf, p_bf, r_bf = _brute_force_rand(t, s)
        np.testing.assert_allclose([are, p, r], [are_bf, p_bf, r_bf],
                                   atol=1e-12)
    # perfect (label-permuted) segmentation: zero error
    t = np.repeat([1, 2, 3], 10)
    s = np.repeat([7, 5, 9], 10)
    are, p, r = adapted_rand_error(t, s)
    assert are == 0.0 and p == 1.0 and r == 1.0
    # ignore_labels drops masked ground-truth pixels
    t2 = np.concatenate([t, np.zeros(5, int)])
    s2 = np.concatenate([s, np.full(5, 1)])
    assert adapted_rand_error(t2, s2, ignore_labels=(0,))[0] == 0.0


def test_adapted_rand_error_functor():
    from gfe_mamba_tpu.segmentation.metrics import AdaptedRandError
    rng = np.random.RandomState(1)
    seg = rng.randint(0, 3, size=(2, 6, 6, 4))
    inp = seg[..., None].astype(np.float32)        # (B,*,C=1) channels-last
    tgt = seg[..., None].astype(np.float32)
    assert AdaptedRandError()(inp, tgt) == 0.0
    # single-label ground truth is skipped as 0
    flat = np.zeros((1, 6, 6, 4, 1), np.float32)
    assert AdaptedRandError()(flat, flat) == 0.0


def test_boundary_adapted_rand_error():
    from gfe_mamba_tpu.segmentation.metrics import (
        BoundaryAdaptedRandError, get_evaluation_metric,
    )
    # two slabs split by a boundary plane at y=4
    gt = np.zeros((1, 9, 8, 4), np.int32)
    gt[:, :4] = 1
    gt[:, 5:] = 2
    boundary = np.zeros((1, 9, 8, 4, 1), np.float32)
    boundary[:, 4] = 1.0                          # boundary prob map
    metric = BoundaryAdaptedRandError()
    err = metric(boundary, gt[..., None].astype(np.float32))
    assert err < 1e-6
    # factory path
    fn = get_evaluation_metric({"eval_metric": {
        "name": "BoundaryAdaptedRandError", "thresholds": [0.5]}})
    assert fn(boundary, gt[..., None].astype(np.float32)) < 1e-6


def test_instance_ap_golden():
    from gfe_mamba_tpu.segmentation.metrics import (
        InstanceAccuracy, InstanceAveragePrecision, SegmentationScores,
    )
    # gt: two 4x4 blobs; seg: one exact match, one shifted by 2 cols
    gt = np.zeros((12, 12), np.int32)
    gt[1:5, 1:5] = 1
    gt[7:11, 1:5] = 2
    seg = np.zeros((12, 12), np.int32)
    seg[1:5, 1:5] = 1                      # IoU 1.0
    seg[7:11, 3:7] = 2                     # IoU 8/24 = 1/3
    m = SegmentationScores(gt, seg).metrics(0.5)
    assert m == {"precision": 0.5, "recall": 0.5, "accuracy": 1 / 3,
                 "f1": 0.5}
    assert InstanceAccuracy(0.5)(seg, gt) == 1 / 3
    # AP over 0.50:0.95 -- the exact-match blob passes all 10 thresholds,
    # the shifted one never does: acc = 1/3 at each threshold
    np.testing.assert_allclose(InstanceAveragePrecision()(seg, gt), 1 / 3)


def test_blobs_average_precision_factory():
    from gfe_mamba_tpu.segmentation.metrics import get_evaluation_metric
    # perfect blob prediction through the factory, channels-last batch
    vol = np.zeros((1, 10, 10, 6), np.float32)
    vol[:, 1:4, 1:4, 1:4] = 1.0
    vol[:, 6:9, 6:9, 1:4] = 1.0
    inp = vol[..., None]
    from scipy.ndimage import label
    tgt = label(vol[0] > 0)[0][None, ..., None].astype(np.float32)
    fn = get_evaluation_metric({"eval_metric": {
        "name": "BlobsAveragePrecision"}})
    assert fn(inp, tgt) == 1.0
    # min_instance_size below the 27-voxel blobs keeps them; above it
    # filters every instance from both maps -> trivial zero score
    fn = get_evaluation_metric({"eval_metric": {
        "name": "BlobsAveragePrecision", "min_instance_size": 10}})
    assert fn(inp, tgt) == 1.0
    fn = get_evaluation_metric({"eval_metric": {
        "name": "BlobsAveragePrecision", "min_instance_size": 28}})
    assert fn(inp, tgt) == 0.0


def test_label_to_affinities_golden():
    """Hand-computed affinities on a 2-region volume (ref
    pytorch3dunet/augment/transforms.py:401-437 semantics)."""
    from gfe_mamba_tpu.segmentation.transforms import LabelToAffinities

    # labels split along the LAST axis: [:, :, :2] = 1, [:, :, 2:] = 2
    lab = np.ones((3, 3, 4), np.int64)
    lab[:, :, 2:] = 2

    out = LabelToAffinities(offsets=[1])(lab)
    assert out.shape == (3, 3, 4, 3)  # X, Y, Z channels, channels-last
    x_aff, y_aff, z_aff = out[..., 0], out[..., 1], out[..., 2]
    # the label only changes along the last axis; the offset-1 kernel
    # oriented along that axis (X in the reference's AXES_TRANSPOSE
    # naming) is size-2, so scipy centers it at index 1 and marks the
    # voxel i where m[i] != m[i+1] -- exactly one voxel per interface
    expect_x = np.zeros((3, 3, 4))
    expect_x[:, :, 1] = 1
    np.testing.assert_array_equal(x_aff, expect_x)
    np.testing.assert_array_equal(y_aff, 0)
    np.testing.assert_array_equal(z_aff, 0)

    # aggregate: OR over the three axes == the X channel here
    agg = LabelToAffinities(offsets=[1], aggregate_affinities=True)(lab)
    assert agg.shape == (3, 3, 4, 1)
    np.testing.assert_array_equal(agg[..., 0], expect_x)

    # append_label adds the raw labels as the last channel
    app = LabelToAffinities(offsets=[1], append_label=True)(lab)
    assert app.shape == (3, 3, 4, 4)
    np.testing.assert_array_equal(app[..., 3], lab)


def test_label_to_affinities_offset2_and_ignore():
    from gfe_mamba_tpu.segmentation.transforms import LabelToAffinities

    lab = np.ones((2, 2, 6), np.int64)
    lab[:, :, 3:] = 5
    out = LabelToAffinities(offsets=[2])(lab)
    # offset-2 kernel [1, 0, -1] centered: |m[i-1] - m[i+1]| > 0 under
    # scipy 'reflect' edges -> voxels within 1 of the 2|5 interface
    expect = np.zeros((2, 2, 6))
    expect[:, :, 2:4] = 1
    np.testing.assert_array_equal(out[..., 0], expect)

    ign = LabelToAffinities(offsets=[2], ignore_index=5)(lab)
    # ignore_index restores the label where it sat in the input
    np.testing.assert_array_equal(ign[..., 0][lab == 5], 5)
    np.testing.assert_array_equal(
        ign[..., 0][lab != 5], expect[lab != 5])


def test_label_to_z_affinities_and_random():
    from gfe_mamba_tpu.segmentation.transforms import (
        LabelToZAffinities, RandomLabelToAffinities)

    # label changes along the FIRST axis (= the reference's Z kernel
    # orientation, AXES_TRANSPOSE[2] = (2, 0, 1))
    lab = np.ones((4, 3, 3), np.int64)
    lab[2:] = 3
    out = LabelToZAffinities(offsets=[1])(lab)
    assert out.shape == (4, 3, 3, 1)
    expect = np.zeros((4, 3, 3))
    expect[1] = 1
    np.testing.assert_array_equal(out[..., 0], expect)

    rng = np.random.default_rng(0)
    r = RandomLabelToAffinities(rng, max_offset=3)(lab)
    assert r.shape == (4, 3, 3, 1)
    assert set(np.unique(r)) <= {0.0, 1.0}


def test_label_to_boundary_and_affinities():
    from gfe_mamba_tpu.segmentation.transforms import (
        LabelToBoundaryAndAffinities)

    lab = np.zeros((3, 3, 4), np.int64)
    lab[:, :, :2] = 1
    lab[:, :, 2:] = 2
    t = LabelToBoundaryAndAffinities(xy_offsets=[1], z_offsets=[1])
    out = t(lab)
    assert out.shape == (3, 3, 4, 4)  # 1 boundary + 3 affinity channels
    # boundary channel: voxels adjacent to the 1|2 interface
    assert out[..., 0].max() == 1.0
    # affinity channels equal the standalone transform
    from gfe_mamba_tpu.segmentation.transforms import LabelToAffinities
    np.testing.assert_array_equal(
        out[..., 1:], LabelToAffinities(offsets=[1], z_offsets=[1])(lab))

    fg = LabelToBoundaryAndAffinities(
        xy_offsets=[1], z_offsets=[1], foreground=True)(lab)
    assert fg.shape == (3, 3, 4, 5)
    np.testing.assert_array_equal(fg[..., 0], (lab > 0).astype(np.float32))


def test_affinity_transforms_in_factory():
    from gfe_mamba_tpu.segmentation.transforms import build_transforms

    lab = np.ones((2, 2, 4), np.int64)
    lab[:, :, 2:] = 2
    pipe = build_transforms([
        {"name": "LabelToAffinities", "offsets": [1]}])
    assert pipe(lab).shape == (2, 2, 4, 3)
    pipe2 = build_transforms([
        {"name": "RandomLabelToAffinities", "max_offset": 2}])
    assert pipe2(lab).shape == (2, 2, 4, 1)


def test_lazy_predictor_matches_standard(tmp_path):
    """LazyPredictor (ref predictor.py:191-230): on-disk assembly +
    chunked normalization must equal the in-memory predictor."""
    import h5py
    from gfe_mamba_tpu.segmentation.predictor import (
        sliding_window_predict, sliding_window_predict_lazy)

    rng = np.random.default_rng(0)
    vol = rng.normal(size=(13, 11, 9)).astype(np.float32)

    def fwd(batch):
        return batch * 2.0 + 1.0

    std = sliding_window_predict(fwd, vol, (6, 6, 6), (4, 4, 4))
    out = str(tmp_path / "lazy.h5")
    sliding_window_predict_lazy(fwd, vol, (6, 6, 6), (4, 4, 4), out)
    with h5py.File(out) as f:
        assert "normalization" not in f
        lazy = f["predictions"][...]
    np.testing.assert_allclose(lazy, std, atol=1e-5)


def test_dsb_predictor(tmp_path):
    import h5py
    from gfe_mamba_tpu.segmentation.predictor import (
        dsb_predict, pmaps_to_segmentation)

    # two blobs -> two instance labels
    pm = np.zeros((8, 8), np.float32)
    pm[1:3, 1:3] = 0.9
    pm[5:7, 5:7] = 0.8
    seg = pmaps_to_segmentation(pm)
    assert set(np.unique(seg)) == {0, 1, 2}

    img = pm[..., None]
    paths = dsb_predict(lambda b: b, [(img, str(tmp_path / "img1.png"))],
                        output_dir=str(tmp_path))
    assert paths == [str(tmp_path / "img1_predictions.h5")]
    with h5py.File(paths[0]) as f:
        np.testing.assert_allclose(f["predictions"][...], pm)
        assert set(np.unique(f["segmentation"][...])) == {0, 1, 2}


def test_dsb_predict_batched_image_single_path_raises(tmp_path):
    from gfe_mamba_tpu.segmentation.predictor import dsb_predict

    batch = np.zeros((3, 8, 8, 1), np.float32)
    with pytest.raises(ValueError, match="one path per batch item"):
        dsb_predict(lambda b: b, [(batch, str(tmp_path / "a.png"))])
