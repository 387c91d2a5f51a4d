"""Tests for on-device preprocessing ops vs. reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from gfe_mamba_tpu.ops import (
    adaptive_normal, scale_intensity_range, resize_volume, crop_foreground,
)
from gfe_mamba_tpu.ops.volumetric import (
    foreground_bbox, foreground_bbox_jax, crop_resize,
)


def _reference_adaptive_normal(img: np.ndarray) -> np.ndarray:
    """Literal numpy transcription of data_normalization.py:20-48."""
    min_p, max_p = 0.001, 0.999
    pixel = np.sort(img[img >= 0].reshape(-1))
    idx = int(round(len(pixel) - 1) * min_p + 0.5)
    idx = min(max(idx, 0), len(pixel) - 1)
    value_min = pixel[idx]
    idx = int(round(len(pixel) - 1) * max_p + 0.5)
    idx = min(max(idx, 0), len(pixel) - 1)
    value_max = pixel[idx]
    mean = (value_max + value_min) / 2.0
    std = (value_max - value_min) / 2.0
    out = (img - mean) / std
    return np.clip(out, -1.0, 1.0)


def test_adaptive_normal_matches_reference():
    rng = np.random.RandomState(0)
    img = rng.uniform(-100, 4000, size=(24, 24, 16)).astype(np.float32)
    expected = _reference_adaptive_normal(img)
    got = np.asarray(jax.jit(adaptive_normal)(jnp.asarray(img)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_adaptive_normal_range():
    rng = np.random.RandomState(1)
    img = rng.exponential(500, size=(10, 10, 10)).astype(np.float32)
    out = np.asarray(adaptive_normal(jnp.asarray(img)))
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_scale_intensity_range():
    img = jnp.asarray([0.0, 1.0, 2.0, 5.0])
    out = scale_intensity_range(img, 0.0, 2.0, -1.0, 1.0, clip=True)
    np.testing.assert_allclose(np.asarray(out), [-1.0, 0.0, 1.0, 1.0])


def test_resize_volume_shapes():
    x = jnp.ones((20, 20, 12))
    assert resize_volume(x, (10, 10, 6)).shape == (10, 10, 6)
    x = jnp.ones((20, 20, 12, 1))
    assert resize_volume(x, (10, 10, 6)).shape == (10, 10, 6, 1)
    x = jnp.ones((2, 20, 20, 12, 1))
    assert resize_volume(x, (10, 10, 6)).shape == (2, 10, 10, 6, 1)


def test_crop_foreground_host():
    label = np.zeros((10, 10, 10))
    label[2:5, 3:7, 1:9] = 1.0
    img = np.arange(1000.0).reshape(10, 10, 10)
    out = crop_foreground(img, label)
    assert out.shape == (3, 4, 8)
    np.testing.assert_array_equal(out, img[2:5, 3:7, 1:9])


def test_foreground_bbox_jax_matches_host():
    rng = np.random.RandomState(3)
    label = (rng.rand(12, 11, 10) > 0.9).astype(np.float32)
    start_np, stop_np = foreground_bbox(label)
    start_j, stop_j = jax.jit(foreground_bbox_jax)(jnp.asarray(label))
    np.testing.assert_array_equal(np.asarray(start_j), start_np)
    np.testing.assert_array_equal(np.asarray(stop_j), stop_np)


def _torch_trilinear(img: np.ndarray, size) -> np.ndarray:
    """Golden half-pixel (align_corners=False) trilinear resample."""
    import torch
    t = torch.from_numpy(img)[None, None]
    out = torch.nn.functional.interpolate(t, size=size, mode="trilinear",
                                          align_corners=False)
    return out[0, 0].numpy()


def test_crop_resize_matches_torch_trilinear():
    rng = np.random.RandomState(4)
    img = rng.rand(16, 14, 12).astype(np.float32)
    start = jnp.zeros(3, jnp.int32)
    stop = jnp.asarray(img.shape, jnp.int32)
    fused = crop_resize(jnp.asarray(img), start, stop, (8, 8, 8))
    np.testing.assert_allclose(np.asarray(fused),
                               _torch_trilinear(img, (8, 8, 8)),
                               rtol=1e-4, atol=1e-5)


def test_crop_resize_traced_bbox_jits():
    rng = np.random.RandomState(5)
    img = rng.rand(16, 14, 12).astype(np.float32)
    label = jnp.zeros((16, 14, 12)).at[4:12, 2:10, 3:9].set(1.0)

    @jax.jit
    def fused(img, label):
        start, stop = foreground_bbox_jax(label)
        return crop_resize(img, start, stop, (8, 8, 8))

    out = fused(jnp.asarray(img), label)
    expected = _torch_trilinear(np.ascontiguousarray(img[4:12, 2:10, 3:9]),
                                (8, 8, 8))
    np.testing.assert_allclose(np.asarray(out), expected,
                               rtol=1e-4, atol=1e-5)
