"""JAX-native SSL augmentation pipeline (data/augment2d.py) vs the
torchvision semantics the reference composes (vit_pytorch_diy/dino.py:
205-229, es_vit.py:244-268): hand-computed goldens for every color op,
exact crop+resize equivalence, and pipeline/jit/vmap behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfe_mamba_tpu.data import augment2d as A


def _img(h=12, w=14, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).rand(h, w, 3).astype(np.float32))


# ---------------------------------------------------------------------------
# color ops: hand-computed torchvision.functional goldens
# ---------------------------------------------------------------------------


def test_grayscale_weights():
    x = _img()
    g = A.grayscale(x)
    l = 0.2989 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
    for c in range(3):
        np.testing.assert_allclose(g[..., c], l, rtol=1e-6)


def test_adjust_brightness_is_clipped_scale():
    x = _img()
    np.testing.assert_allclose(A.adjust_brightness(x, 1.7),
                               np.clip(np.asarray(x) * 1.7, 0, 1),
                               rtol=1e-6)


def test_adjust_contrast_blends_with_gray_mean():
    x = _img()
    l = 0.2989 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
    mean = float(l.mean())
    want = np.clip(0.4 * np.asarray(x) + 0.6 * mean, 0, 1)
    np.testing.assert_allclose(A.adjust_contrast(x, 0.4), want,
                               rtol=1e-5, atol=1e-6)


def test_adjust_saturation_blends_with_gray():
    x = _img()
    g = np.asarray(A.grayscale(x))
    want = np.clip(1.5 * np.asarray(x) + (1 - 1.5) * g, 0, 1)
    np.testing.assert_allclose(A.adjust_saturation(x, 1.5), want,
                               rtol=1e-5, atol=1e-6)


def test_adjust_saturation_zero_is_grayscale():
    x = _img()
    np.testing.assert_allclose(A.adjust_saturation(x, 0.0),
                               A.grayscale(x), atol=1e-6)


def test_hue_rotation_on_primaries():
    red = jnp.zeros((1, 1, 3)).at[..., 0].set(1.0)
    np.testing.assert_allclose(A.adjust_hue(red, 1.0 / 3.0),
                               [[[0, 1, 0]]], atol=1e-6)
    np.testing.assert_allclose(A.adjust_hue(red, -1.0 / 3.0),
                               [[[0, 0, 1]]], atol=1e-6)
    np.testing.assert_allclose(A.adjust_hue(red, 0.5),
                               [[[0, 1, 1]]], atol=1e-6)  # red -> cyan


def test_hsv_round_trip_and_gray_stability():
    x = _img()
    np.testing.assert_allclose(A.hsv_to_rgb(A.rgb_to_hsv(x)), x,
                               atol=1e-5)
    gray = jnp.full((3, 3, 3), 0.37)
    np.testing.assert_allclose(A.adjust_hue(gray, 0.31), gray, atol=1e-6)


def test_color_jitter_identity_ranges():
    # zero jitter amplitudes -> every factor is exactly 1 / shift 0
    x = _img()
    y = A.color_jitter(jax.random.PRNGKey(0), x, brightness=0.0,
                       contrast=0.0, saturation=0.0, hue=0.0)
    np.testing.assert_allclose(y, x, atol=1e-5)


def test_color_jitter_order_varies_with_key():
    x = _img()
    outs = [np.asarray(A.color_jitter(jax.random.PRNGKey(k), x))
            for k in range(3)]
    assert not np.allclose(outs[0], outs[1])
    assert np.all([(o >= 0).all() and (o <= 1).all() for o in outs])


# ---------------------------------------------------------------------------
# flips / grayscale gates / blur
# ---------------------------------------------------------------------------


def test_random_hflip_flips_width_axis():
    x = _img()
    y = A.random_hflip(jax.random.PRNGKey(0), x, p=1.0)
    np.testing.assert_allclose(y, np.asarray(x)[:, ::-1])
    np.testing.assert_allclose(
        A.random_hflip(jax.random.PRNGKey(0), x, p=0.0), x)


def test_random_grayscale_gate():
    x = _img()
    np.testing.assert_allclose(
        A.random_grayscale(jax.random.PRNGKey(0), x, p=1.0),
        A.grayscale(x))
    np.testing.assert_allclose(
        A.random_grayscale(jax.random.PRNGKey(0), x, p=0.0), x)


def test_gaussian_blur_impulse_response():
    sigma = 1.3
    x = jnp.zeros((7, 7, 1)).at[3, 3, 0].set(1.0)
    y = np.asarray(A.gaussian_blur(x, sigma, ksize=3))[..., 0]
    k = np.exp(-(np.arange(3) - 1.0) ** 2 / (2 * sigma ** 2))
    k /= k.sum()
    np.testing.assert_allclose(y[2:5, 2:5], np.outer(k, k), rtol=1e-5)
    assert y[0].sum() == 0


def test_gaussian_blur_constant_invariant_reflect_pad():
    x = jnp.full((6, 5, 3), 0.42)
    np.testing.assert_allclose(A.gaussian_blur(x, 2.0), x, rtol=1e-6)


def test_normalize_imagenet():
    x = _img()
    y = np.asarray(A.normalize(x))
    want = (np.asarray(x) - np.array(A.IMAGENET_MEAN)) / np.array(
        A.IMAGENET_STD)
    np.testing.assert_allclose(y, want, rtol=1e-5)


# ---------------------------------------------------------------------------
# random resized crop
# ---------------------------------------------------------------------------


def test_crop_and_resize_matches_slice_plus_resize():
    x = _img(16, 20)
    box = jnp.array([3.0, 5.0, 8.0, 10.0])
    out = A.crop_and_resize(x, box, (12, 12))
    ref = jax.image.resize(x[3:11, 5:15], (12, 12, 3), "linear",
                           antialias=False)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_crop_and_resize_identity_box():
    x = _img(16, 20)
    out = A.crop_and_resize(x, jnp.array([0.0, 0.0, 16.0, 20.0]),
                            (16, 20))
    np.testing.assert_allclose(out, x, atol=1e-6)


def test_sample_crop_box_respects_scale_bounds():
    H, W = 32, 32
    areas, boxes = [], []
    for s in range(50):
        box = np.asarray(A.sample_crop_box(
            jax.random.PRNGKey(s), (H, W), scale=(0.2, 0.5)))
        i, j, h, w = box
        assert 0 <= i and 0 <= j
        assert i + h <= H and j + w <= W
        areas.append(h * w / (H * W))
        boxes.append(box)
    # rounding makes the bounds soft; allow one-pixel slack
    assert min(areas) > 0.15 and max(areas) < 0.56
    assert np.std([b[0] for b in boxes]) > 0  # positions vary


def test_sample_crop_box_fallback_is_center_whole_image():
    # scale forces target areas far above the image -> every attempt
    # invalid -> torchvision center-crop fallback (whole square image)
    box = np.asarray(A.sample_crop_box(
        jax.random.PRNGKey(0), (16, 16), scale=(4.0, 4.0)))
    np.testing.assert_allclose(box, [0.0, 0.0, 16.0, 16.0])


def test_random_resized_crop_shape_and_jit():
    x = _img(20, 24)
    f = jax.jit(lambda k, im: A.random_resized_crop(
        k, im, 16, scale=(0.3, 0.9)))
    y = f(jax.random.PRNGKey(1), x)
    assert y.shape == (16, 16, 3)
    assert np.isfinite(np.asarray(y)).all()


# ---------------------------------------------------------------------------
# composed pipelines
# ---------------------------------------------------------------------------


def test_byol_augment_jits_and_is_key_dependent():
    x = _img(16, 16)
    f = jax.jit(A.byol_augment)
    y0 = np.asarray(f(jax.random.PRNGKey(0), x))
    y1 = np.asarray(f(jax.random.PRNGKey(1), x))
    assert y0.shape == x.shape
    assert not np.allclose(y0, y1)
    # normalize runs last: values leave [0, 1]
    assert y0.min() < 0


def test_ssl_views_batch_per_sample_randomness():
    imgs = jnp.stack([_img(18, 18, seed=3)] * 2)  # identical pair
    views = jax.jit(
        lambda k, im: A.ssl_views_batch(k, im, image_size=8))(
        jax.random.PRNGKey(0), imgs)
    assert views.local_one.shape == (2, 8, 8, 3)
    assert views.global_two.shape == (2, 8, 8, 3)
    # same input image, different per-sample keys -> different views
    assert not np.allclose(views.local_one[0], views.local_one[1])
    for v in views:
        assert np.isfinite(np.asarray(v)).all()


def test_ssl_views_custom_augment_fn():
    # augment_fn receives (key, img); identity makes global crop of the
    # whole image deterministic under scale=(1, 1)
    x = _img(10, 10, seed=5)
    views = A.ssl_views(jax.random.PRNGKey(2), x, image_size=10,
                        global_lower_crop_scale=1.0,
                        augment_fn=lambda k, im: im,
                        augment_fn2=lambda k, im: im)
    # aspect ratio 1 is within bounds, scale==1 -> whole-image crop
    np.testing.assert_allclose(views.global_one, x, atol=1e-5)
