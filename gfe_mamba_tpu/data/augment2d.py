"""JAX-native 2D image augmentations for the self-supervised ViT zoo.

Replaces the torchvision pipeline the reference's DINO / EsViT wrappers
build (vit_pytorch_diy/dino.py:205-229, vit_pytorch_diy/es_vit.py:
244-268): ``RandomApply(ColorJitter(.8,.8,.8,.2), p=.3)``,
``RandomGrayscale(.2)``, ``RandomHorizontalFlip()``,
``RandomApply(GaussianBlur((3,3),(1,2)), p=.2)``,
``Normalize(imagenet)``, plus the local/global ``RandomResizedCrop``
pair (dino.py:228-229, es_vit.py:267-268).

TPU-native design: every op is jit/vmap-friendly (static output
shapes), driven by explicit ``jax.random`` keys, and runs ON DEVICE.
Random-resized-crop is an arbitrary fractional-box bilinear resample
via ``jax.image.scale_and_translate`` -- no dynamic-shape crop ever
materializes, so the whole view pipeline compiles once.  Because keys
are explicit, augmentation is per-SAMPLE under ``jax.vmap`` (the
torchvision stack on a batched tensor draws one parameter set for the
whole batch -- per-sample views are strictly stronger for SSL).

Images are channels-last ``(H, W, C)`` float in [0, 1] (repo
convention; torchvision is CHW).  Color-op math follows
torchvision.transforms.functional semantics: brightness/contrast/
saturation are blends clamped to [0, 1]; hue goes through HSV.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

IMAGENET_MEAN = (0.485, 0.456, 0.406)   # dino.py:219 / es_vit.py:258
IMAGENET_STD = (0.229, 0.224, 0.225)


# ---------------------------------------------------------------------------
# color space
# ---------------------------------------------------------------------------


def rgb_to_hsv(img: Array) -> Array:
    """(..., 3) RGB in [0,1] -> HSV in [0,1] (torchvision _rgb2hsv)."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    cr = maxc - minc
    ones = jnp.ones_like(maxc)
    s = cr / jnp.where(maxc == 0, ones, maxc)
    cr_div = jnp.where(cr == 0, ones, cr)
    rc = (maxc - r) / cr_div
    gc = (maxc - g) / cr_div
    bc = (maxc - b) / cr_div
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(cr == 0, 0.0, (h / 6.0) % 1.0)
    return jnp.stack([h, s, maxc], axis=-1)


def hsv_to_rgb(img: Array) -> Array:
    """(..., 3) HSV in [0,1] -> RGB (torchvision _hsv2rgb)."""
    h, s, v = img[..., 0], img[..., 1], img[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    sel = jnp.stack([
        jnp.stack([v, t, p], -1), jnp.stack([q, v, p], -1),
        jnp.stack([p, v, t], -1), jnp.stack([p, q, v], -1),
        jnp.stack([t, p, v], -1), jnp.stack([v, p, q], -1)], 0)
    return jnp.take_along_axis(
        sel, i[None, ..., None].astype(jnp.int32), axis=0)[0]


def grayscale(img: Array) -> Array:
    """ITU-R 601 luma, broadcast back to 3 channels (torchvision
    rgb_to_grayscale weights)."""
    l = (0.2989 * img[..., 0] + 0.587 * img[..., 1]
         + 0.114 * img[..., 2])
    return jnp.broadcast_to(l[..., None], img.shape)


# ---------------------------------------------------------------------------
# point color ops (torchvision functional semantics, clamped to [0,1])
# ---------------------------------------------------------------------------


def adjust_brightness(img: Array, factor: Array) -> Array:
    return jnp.clip(img * factor, 0.0, 1.0)


def adjust_contrast(img: Array, factor: Array) -> Array:
    mean = grayscale(img)[..., 0].mean(axis=(-2, -1), keepdims=True)
    return jnp.clip(factor * img + (1.0 - factor) * mean[..., None],
                    0.0, 1.0)


def adjust_saturation(img: Array, factor: Array) -> Array:
    return jnp.clip(factor * img + (1.0 - factor) * grayscale(img),
                    0.0, 1.0)


def adjust_hue(img: Array, shift: Array) -> Array:
    """shift in [-0.5, 0.5]: rotate the HSV hue channel."""
    hsv = rgb_to_hsv(jnp.clip(img, 0.0, 1.0))
    h = (hsv[..., 0] + shift) % 1.0
    return hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))


def color_jitter(key: Array, img: Array, brightness: float = 0.8,
                 contrast: float = 0.8, saturation: float = 0.8,
                 hue: float = 0.2) -> Array:
    """torchvision ColorJitter: factors ~ U(max(0, 1-v), 1+v), hue
    ~ U(-hue, hue), the four ops applied in a random order."""
    kf, kp = jax.random.split(key)
    u = jax.random.uniform(kf, (4,))
    fb = jnp.maximum(0.0, 1.0 - brightness) + u[0] * (
        (1.0 + brightness) - jnp.maximum(0.0, 1.0 - brightness))
    fc = jnp.maximum(0.0, 1.0 - contrast) + u[1] * (
        (1.0 + contrast) - jnp.maximum(0.0, 1.0 - contrast))
    fs = jnp.maximum(0.0, 1.0 - saturation) + u[2] * (
        (1.0 + saturation) - jnp.maximum(0.0, 1.0 - saturation))
    fh = (2.0 * u[3] - 1.0) * hue
    perm = jax.random.permutation(kp, 4)
    branches = [
        lambda x: adjust_brightness(x, fb),
        lambda x: adjust_contrast(x, fc),
        lambda x: adjust_saturation(x, fs),
        lambda x: adjust_hue(x, fh),
    ]
    for step in range(4):
        img = jax.lax.switch(perm[step], branches, img)
    return img


def random_grayscale(key: Array, img: Array, p: float = 0.2) -> Array:
    u = jax.random.uniform(key, ())
    return jnp.where(u < p, grayscale(img), img)


def random_hflip(key: Array, img: Array, p: float = 0.5) -> Array:
    """Flip the width axis (axis -2) with probability p."""
    u = jax.random.uniform(key, ())
    return jnp.where(u < p, img[..., :, ::-1, :], img)


# ---------------------------------------------------------------------------
# gaussian blur
# ---------------------------------------------------------------------------


def _gauss_kernel1d(sigma: Array, ksize: int) -> Array:
    x = jnp.arange(ksize, dtype=jnp.float32) - (ksize - 1) / 2.0
    k = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / k.sum()


def gaussian_blur(img: Array, sigma: Array, ksize: int = 3) -> Array:
    """Separable Gaussian blur with reflect padding (torchvision
    GaussianBlur semantics); sigma may be a traced scalar."""
    k = _gauss_kernel1d(jnp.asarray(sigma, jnp.float32), ksize)
    pad = ksize // 2
    dt = img.dtype
    x = img.astype(jnp.float32)
    lead = x.ndim - 3
    cfg = [(0, 0)] * lead
    xh = jnp.pad(x, cfg + [(pad, pad), (0, 0), (0, 0)], mode="reflect")
    x = sum(xh[..., i:i + x.shape[-3], :, :] * k[i] for i in range(ksize))
    xw = jnp.pad(x, cfg + [(0, 0), (pad, pad), (0, 0)], mode="reflect")
    x = sum(xw[..., :, i:i + x.shape[-2], :] * k[i] for i in range(ksize))
    return x.astype(dt)


def random_gaussian_blur(key: Array, img: Array, p: float = 0.2,
                         sigma_range: Tuple[float, float] = (1.0, 2.0),
                         ksize: int = 3) -> Array:
    ku, ks = jax.random.split(key)
    sigma = jax.random.uniform(ks, (), minval=sigma_range[0],
                               maxval=sigma_range[1])
    u = jax.random.uniform(ku, ())
    return jnp.where(u < p, gaussian_blur(img, sigma, ksize), img)


def normalize(img: Array, mean: Sequence[float] = IMAGENET_MEAN,
              std: Sequence[float] = IMAGENET_STD) -> Array:
    m = jnp.asarray(mean, img.dtype)
    s = jnp.asarray(std, img.dtype)
    return (img - m) / s


# ---------------------------------------------------------------------------
# random resized crop (static-shape: fractional box -> scale_and_translate)
# ---------------------------------------------------------------------------


def _linear_resample_matrix(o_n: int, i0: Array, ext: Array,
                            total: int) -> Array:
    """(o_n, total) bilinear-resample weights mapping the fractional
    1D span [i0, i0 + ext) of a ``total``-sample axis onto ``o_n``
    output samples: output o's center sits at input coordinate
    (o + 0.5) * ext/o_n - 0.5 + i0 (half-pixel convention), clamped to
    the span's valid samples [i0, i0 + ext - 1] exactly as a real
    crop-then-resize would clamp at the crop edge; the weight row is
    the triangle kernel relu(1 - |u - c|)."""
    c = (jnp.arange(o_n, dtype=jnp.float32) + 0.5) * (ext / o_n) - 0.5 + i0
    c = jnp.clip(c, i0, i0 + ext - 1.0)
    u = jnp.arange(total, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(u[None, :] - c[:, None]))


def crop_and_resize(img: Array, box: Array,
                    out_hw: Tuple[int, int]) -> Array:
    """Bilinear-resample the fractional box ``(i, j, h, w)`` (pixel
    units, float) of ``img`` (H, W, C) to ``out_hw``.

    Bit-matches crop + bilinear resize
    (``jax.image.resize(img[i:i+h, j:j+w], out, "linear",
    antialias=False)``) for integer boxes, but with STATIC shapes for
    any traced fractional box: the separable triangle-kernel weights
    become two dense (out, in) matrices and the resample is two
    matmuls -- MXU work instead of gathers."""
    i, j, h, w = box[0], box[1], box[2], box[3]
    oh, ow = out_hw
    wy = _linear_resample_matrix(oh, i, h, img.shape[0])
    wx = _linear_resample_matrix(ow, j, w, img.shape[1])
    t = jnp.einsum("px,yxc->ypc", wx, img.astype(jnp.float32))
    out = jnp.einsum("oy,ypc->opc", wy, t)
    return out.astype(img.dtype)


def sample_crop_box(key: Array, in_hw: Tuple[int, int],
                    scale: Tuple[float, float],
                    ratio: Tuple[float, float] = (3 / 4, 4 / 3),
                    attempts: int = 10) -> Array:
    """torchvision RandomResizedCrop.get_params with static shapes:
    ``attempts`` (area, log-aspect) draws evaluated in parallel, the
    first in-bounds one selected, with the deterministic
    clamp-to-ratio center-crop fallback.  Returns (i, j, h, w) floats
    in pixel units."""
    H, W = in_hw
    area = float(H * W)
    ka, kr, kij = jax.random.split(key, 3)
    target = area * jax.random.uniform(
        ka, (attempts,), minval=scale[0], maxval=scale[1])
    log_r = jax.random.uniform(
        kr, (attempts,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]))
    ar = jnp.exp(log_r)
    w = jnp.round(jnp.sqrt(target * ar))
    h = jnp.round(jnp.sqrt(target / ar))
    ok = (w > 0) & (w <= W) & (h > 0) & (h <= H)
    any_ok = jnp.any(ok)
    first = jnp.argmax(ok)                  # first valid attempt
    h_ok, w_ok = h[first], w[first]

    # fallback (torchvision): clamp aspect to the ratio bounds, center
    in_ratio = W / H
    w_fb = jnp.where(in_ratio < ratio[0], float(W),
                     jnp.where(in_ratio > ratio[1],
                               jnp.round(H * ratio[1]), float(W)))
    h_fb = jnp.where(in_ratio < ratio[0], jnp.round(W / ratio[0]),
                     jnp.where(in_ratio > ratio[1], float(H), float(H)))
    hh = jnp.where(any_ok, h_ok, h_fb)
    ww = jnp.where(any_ok, w_ok, w_fb)

    u = jax.random.uniform(kij, (2,))
    i_rand = jnp.floor(u[0] * (H - hh + 1.0))
    j_rand = jnp.floor(u[1] * (W - ww + 1.0))
    i_fb = jnp.floor((H - hh) / 2.0)     # torchvision: (H - h) // 2
    j_fb = jnp.floor((W - ww) / 2.0)
    ii = jnp.where(any_ok, i_rand, i_fb)
    jj = jnp.where(any_ok, j_rand, j_fb)
    return jnp.stack([ii, jj, hh, ww])


def random_resized_crop(key: Array, img: Array, out_size: int,
                        scale: Tuple[float, float],
                        ratio: Tuple[float, float] = (3 / 4, 4 / 3)) -> Array:
    """torchvision ``RandomResizedCrop((out, out), scale=scale)`` on an
    (H, W, C) image, fully on device with static shapes."""
    box = sample_crop_box(key, img.shape[:2], scale, ratio)
    return crop_and_resize(img, box, (out_size, out_size))


# ---------------------------------------------------------------------------
# composed pipelines
# ---------------------------------------------------------------------------


def byol_augment(key: Array, img: Array, jitter_p: float = 0.3,
                 gray_p: float = 0.2, blur_p: float = 0.2,
                 mean: Sequence[float] = IMAGENET_MEAN,
                 std: Sequence[float] = IMAGENET_STD) -> Array:
    """The reference DEFAULT_AUG (dino.py:207-220, es_vit.py:246-259):
    RandomApply(ColorJitter(.8,.8,.8,.2), p=.3) -> RandomGrayscale(.2)
    -> RandomHorizontalFlip -> RandomApply(GaussianBlur(3,(1,2)), p=.2)
    -> Normalize(imagenet).  img: (H, W, C) in [0, 1]."""
    kj, kjp, kg, kf, kb = jax.random.split(key, 5)
    jit_img = color_jitter(kj, img)
    u = jax.random.uniform(kjp, ())
    img = jnp.where(u < jitter_p, jit_img, img)
    img = random_grayscale(kg, img, gray_p)
    img = random_hflip(kf, img)
    img = random_gaussian_blur(kb, img, blur_p)
    return normalize(img, mean, std)


class SSLViews(NamedTuple):
    """The four crops the reference feeds student/teacher
    (dino.py:279-290, es_vit.py:322-333)."""
    local_one: Array
    local_two: Array
    global_one: Array
    global_two: Array


def ssl_views(key: Array, img: Array, image_size: int,
              local_upper_crop_scale: float = 0.4,
              global_lower_crop_scale: float = 0.5,
              augment_fn: Optional[Callable[[Array, Array], Array]] = None,
              augment_fn2: Optional[Callable[[Array, Array], Array]] = None,
              ) -> SSLViews:
    """DINO/EsViT view pipeline for one (H, W, C) image: two augmented
    copies, each locally- and globally-cropped (dino.py:226-229 +
    279-282).  ``vmap`` over (key, img) for a batch."""
    aug1 = augment_fn or byol_augment
    aug2 = augment_fn2 or byol_augment
    k1, k2, kl1, kl2, kg1, kg2 = jax.random.split(key, 6)
    one = aug1(k1, img)
    two = aug2(k2, img)
    local = functools.partial(
        random_resized_crop, out_size=image_size,
        scale=(0.05, local_upper_crop_scale))
    glob = functools.partial(
        random_resized_crop, out_size=image_size,
        scale=(global_lower_crop_scale, 1.0))
    return SSLViews(local(kl1, one), local(kl2, two),
                    glob(kg1, one), glob(kg2, two))


def ssl_views_batch(key: Array, imgs: Array, image_size: int,
                    **kw) -> SSLViews:
    """Per-sample ``ssl_views`` over a (B, H, W, C) batch."""
    keys = jax.random.split(key, imgs.shape[0])
    return jax.vmap(lambda k, x: ssl_views(k, x, image_size, **kw))(
        keys, imgs)
