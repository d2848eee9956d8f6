"""Device-side augmentation graph (jit/vmap over the batch).

Reimplements the reference's 12-op CPU augmentation chain
(/root/reference/common/data_utils.py) as pure JAX ops on fixed-shape
uint8 batches, preserving each op's probability and math:

op (reference line)            | semantics preserved
-------------------------------|------------------------------------------
h/v flip (14-59)               | prob .5 each, joint image+label
zoom+rotate (241-273)          | prob .3, angle~N(0,30°), scale~N(1,0.2),
                               | nearest warp around center, border 0
GridMask (276-361)             | prob .2, d∈[W/7,W/3), ratio .5, rotation
                               | ∈[0,360), joint image+label zeroing
brightness (83-102)            | factor~U(.5,2), PIL Brightness = x*f
chroma (175-194)               | PIL Color: blend with L grayscale
contrast (197-216)             | PIL Contrast: blend with mean-L gray
sharpness (219-238)            | PIL Sharpness: blend with SMOOTH filter,
                               | 1-px border passthrough (PIL behaviour)
grayscale (152-172)            | prob .2; NOTE: reference feeds RGB arrays
                               | to cv2 BGR2GRAY, so the effective weights
                               | are (.114, .587, .299) — reproduced
gaussian blur (105-124)        | prob .5, 5x5, sigma 1.1 (cv2 default for
                               | ksize=5), REFLECT_101 borders
random crop (364-399)          | prob .1; crops an input-shape window in
                               | original-image coordinates when the
                               | original is larger (see docstring)
CLAHE histeq (127-149)         | host-side op (pipeline.py) — data-dep
                               | histograms don't map well to TPU; prob .2

The chain runs in the reference's op order (deeplabv3p/data.py:71-106).
Everything is expressed as gathers / elementwise VPU work with static
shapes; per-sample randomness comes from split PRNG keys, so the whole
batch augments as one fused XLA program.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    flip_prob: float = 0.5
    vflip_prob: float = 0.5
    rotate_range: float = 30.0
    zoom_range: float = 0.2
    zoom_rotate_prob: float = 0.3
    gridmask_prob: float = 0.2
    gridmask_ratio: float = 0.5
    brightness_jitter: float = 0.5
    chroma_jitter: float = 0.5
    contrast_jitter: float = 0.5
    sharpness_jitter: float = 0.5
    grayscale_prob: float = 0.2
    blur_prob: float = 0.5
    blur_size: int = 5
    crop_prob: float = 0.1

    @classmethod
    def identity(cls) -> "AugmentConfig":
        """A no-op config: every stochastic op disabled (probabilities 0,
        photometric jitters pinned to factor 1). Keeps the fused
        augment-in-train-step path — normalization and adaptive
        per-image class weights still run — while making training
        deterministic in image space (train.py --no_augment; used by the
        overfit learning proof)."""
        return cls(
            flip_prob=0.0, vflip_prob=0.0, zoom_rotate_prob=0.0,
            gridmask_prob=0.0, brightness_jitter=1.0, chroma_jitter=1.0,
            contrast_jitter=1.0, sharpness_jitter=1.0, grayscale_prob=0.0,
            blur_prob=0.0, crop_prob=0.0,
        )


def _uniform_jitter(key, jitter: float):
    """U(jitter, 1/jitter) — the PIL-enhance factor distribution
    (reference data_utils.py:98,190,213,234)."""
    return jax.random.uniform(key, (), minval=jitter, maxval=1.0 / jitter)


# ----------------------------------------------------------------------------
# geometry: shared nearest-sample affine gather
# ----------------------------------------------------------------------------


def affine_nearest(img: jax.Array, inv: jax.Array, fill: float = 0.0) -> jax.Array:
    """Sample `img` (H, W[, C]) at dst→src affine-mapped coords, nearest.

    inv: (2, 3) matrix mapping destination (x, y) to source (x, y)
    (cv2 warpAffine inverts the user matrix internally; we take the
    already-inverted form). Out-of-bounds reads return `fill`, matching
    cv2 BORDER_CONSTANT / PIL rotate fillcolor=0.
    """
    h, w = img.shape[0], img.shape[1]
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    sx = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    sy = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
    xi = jnp.floor(sx + 0.5).astype(jnp.int32)
    yi = jnp.floor(sy + 0.5).astype(jnp.int32)
    valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    xi = jnp.clip(xi, 0, w - 1)
    yi = jnp.clip(yi, 0, h - 1)
    out = img[yi, xi]
    if img.ndim == 3:
        valid = valid[..., None]
    return jnp.where(valid, out, jnp.asarray(fill, img.dtype))


def _rotation_inv_matrix(cx, cy, angle_deg, scale):
    """Inverse of cv2.getRotationMatrix2D(center, angle, scale): maps dst
    (x, y) to src coordinates."""
    a = jnp.deg2rad(angle_deg)
    cos, sin = jnp.cos(a), jnp.sin(a)
    # forward: [x'] = [ s*cos  s*sin ] [x - cx] + cx   (cv2 angle>0 = CCW)
    #          [y']   [-s*sin  s*cos ] [y - cy] + cy
    # inverse rotation by -a, scale 1/s
    inv_s = 1.0 / scale
    m00 = inv_s * cos
    m01 = -inv_s * sin
    m10 = inv_s * sin
    m11 = inv_s * cos
    t0 = cx - (m00 * cx + m01 * cy)
    t1 = cy - (m10 * cx + m11 * cy)
    return jnp.array([[m00, m01, t0], [m10, m11, t1]])


def random_flips(key, image, label, cfg: AugmentConfig):
    kh, kv = jax.random.split(key)
    do_h = jax.random.uniform(kh) < cfg.flip_prob
    image = jnp.where(do_h, image[:, ::-1], image)
    label = jnp.where(do_h, label[:, ::-1], label)
    do_v = jax.random.uniform(kv) < cfg.vflip_prob
    image = jnp.where(do_v, image[::-1], image)
    label = jnp.where(do_v, label[::-1], label)
    return image, label


def random_zoom_rotate(key, image, label, cfg: AugmentConfig):
    """reference data_utils.py:241-273 (INTER_NEAREST for both)."""
    k1, k2, k3 = jax.random.split(key, 3)
    angle = jax.random.normal(k1) * cfg.rotate_range
    scale = 1.0 + jax.random.normal(k2) * cfg.zoom_range
    do = jax.random.uniform(k3) < cfg.zoom_rotate_prob
    h, w = image.shape[0], image.shape[1]
    inv = _rotation_inv_matrix(w // 2, h // 2, angle, scale)
    warped_img = affine_nearest(image, inv)
    warped_lbl = affine_nearest(label, inv)
    return (
        jnp.where(do, warped_img, image),
        jnp.where(do, warped_lbl, label),
    )


def _gridmask_mask(key, h: int, w: int, ratio: float):
    """GridMask keep-mask (reference Grid.__call__, data_utils.py:288-335).

    Returns float {0,1} mask of shape (h, w); 0 = dropped. mode=1 in the
    reference inverts stripes so the *grid lines are kept*, crossings
    dropped... concretely: final mask = 1 - rot(stripes), multiplied in.
    """
    hh = math.ceil(math.sqrt(h * h + w * w))
    d1, d2 = w // 7, w // 3
    kd, kh_, kw_, kr = jax.random.split(key, 4)
    d = jax.random.randint(kd, (), d1, d2)
    l = (d + 1) // 2  # ceil(d * 0.5) for ratio .5 (data_utils.py:305)
    st_h = jax.random.randint(kh_, (), 0, d)
    st_w = jax.random.randint(kw_, (), 0, d)
    r = jax.random.randint(kr, (), 0, 360)

    ys = jax.lax.broadcasted_iota(jnp.int32, (hh, hh), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (hh, hh), 1)
    row_zero = ((ys - st_h) % d) < l
    col_zero = ((xs - st_w) % d) < l
    mask = jnp.where(row_zero | col_zero, 0.0, 1.0)

    # PIL mask.rotate(r): CCW rotation about the image center (w/2, h/2),
    # nearest, fill 0 outside (data_utils.py:322-325)
    inv = _rotation_inv_matrix(hh / 2.0, hh / 2.0, r.astype(jnp.float32), 1.0)
    mask = affine_nearest(mask, inv, fill=0.0)

    top, left = (hh - h) // 2, (hh - w) // 2
    mask = jax.lax.dynamic_slice(mask, (top, left), (h, w))
    return 1.0 - mask  # mode=1 inversion (data_utils.py:328-329)


def random_gridmask(key, image, label, cfg: AugmentConfig):
    k1, k2 = jax.random.split(key)
    do = jax.random.uniform(k1) < cfg.gridmask_prob
    h, w = image.shape[0], image.shape[1]
    mask = _gridmask_mask(k2, h, w, cfg.gridmask_ratio)
    img_m = image * mask[..., None]
    lbl_m = label * mask.astype(label.dtype)
    return jnp.where(do, img_m, image), jnp.where(do, lbl_m, label)


# ----------------------------------------------------------------------------
# photometric ops (image only; float32 0..255 domain, clipped like PIL)
# ----------------------------------------------------------------------------


def _pil_grayscale_l(image):
    """PIL 'L' conversion: R*299/1000 + G*587/1000 + B*114/1000."""
    return (
        image[..., 0] * 0.299 + image[..., 1] * 0.587 + image[..., 2] * 0.114
    )


def _blend(degenerate, image, factor):
    """PIL Image.blend(degenerate, image, factor), clipped to [0, 255]."""
    out = degenerate + factor * (image - degenerate)
    return jnp.clip(out, 0.0, 255.0)


def random_brightness(key, image, cfg):
    factor = _uniform_jitter(key, cfg.brightness_jitter)
    return _blend(jnp.zeros_like(image), image, factor)


def random_chroma(key, image, cfg):
    factor = _uniform_jitter(key, cfg.chroma_jitter)
    gray = _pil_grayscale_l(image)[..., None] * jnp.ones((1, 1, 3), image.dtype)
    return _blend(gray, image, factor)


def random_contrast(key, image, cfg):
    factor = _uniform_jitter(key, cfg.contrast_jitter)
    # PIL Contrast: solid image at round(mean of L) (ImageEnhance source)
    mean = jnp.floor(jnp.mean(_pil_grayscale_l(image)) + 0.5)
    return _blend(jnp.full_like(image, mean), image, factor)


_SMOOTH_KERNEL = np.array(
    [[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]], np.float32
) / 13.0


def _smooth_filter(image):
    """PIL ImageFilter.SMOOTH with PIL's border behaviour: the 1-pixel
    border is copied from the source (PIL only filters the interior)."""
    x = image.transpose(2, 0, 1)[:, None]  # C,1,H,W
    k = jnp.asarray(_SMOOTH_KERNEL)[None, None]
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    y = y[:, 0].transpose(1, 2, 0)
    out = jnp.clip(y, 0.0, 255.0)
    h, w = image.shape[0], image.shape[1]
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    border = (ys == 0) | (ys == h - 1) | (xs == 0) | (xs == w - 1)
    return jnp.where(border[..., None], image, out)


def random_sharpness(key, image, cfg):
    factor = _uniform_jitter(key, cfg.sharpness_jitter)
    return _blend(_smooth_filter(image), image, factor)


def random_grayscale(key, image, cfg):
    do = jax.random.uniform(key) < cfg.grayscale_prob
    # reference passes RGB arrays through cv2 BGR2GRAY (data_utils.py:169)
    # → swapped weights; kept bug-for-bug for training parity.
    gray = (
        image[..., 0] * 0.114 + image[..., 1] * 0.587 + image[..., 2] * 0.299
    )
    gray3 = gray[..., None] * jnp.ones((1, 1, 3), image.dtype)
    return jnp.where(do, gray3, image)


_CV2_SMALL_GAUSSIAN = {
    1: [1.0],
    3: [0.25, 0.5, 0.25],
    5: [0.0625, 0.25, 0.375, 0.25, 0.0625],
    7: [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125],
}


def _gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    if sigma <= 0 and ksize in _CV2_SMALL_GAUSSIAN:
        # cv2 getGaussianKernel uses fixed binomial taps for sigma<=0,
        # ksize<=7 — what GaussianBlur(img,(5,5),0) actually applies
        return np.asarray(_CV2_SMALL_GAUSSIAN[ksize], np.float32)
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8  # cv2 default formula
    xs = np.arange(ksize) - (ksize - 1) / 2
    k = np.exp(-(xs**2) / (2 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def random_blur(key, image, cfg):
    """cv2.GaussianBlur(image, (5,5), 0) with REFLECT_101 borders
    (reference data_utils.py:105-124)."""
    do = jax.random.uniform(key) < cfg.blur_prob
    k1d = jnp.asarray(_gaussian_kernel1d(cfg.blur_size, 0.0))
    pad = cfg.blur_size // 2
    # np.pad 'reflect' == cv2 BORDER_REFLECT_101 (edge sample not repeated)
    x = jnp.pad(image, ((pad, pad), (pad, pad), (0, 0)), mode="reflect")
    x = x.transpose(2, 0, 1)[:, None]  # (C, 1, H+2p, W+2p)
    kv = k1d.reshape(1, 1, -1, 1)
    kh = k1d.reshape(1, 1, 1, -1)
    dn = ("NCHW", "OIHW", "NCHW")
    x = jax.lax.conv_general_dilated(x, kv, (1, 1), "VALID", dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID", dimension_numbers=dn)
    blurred = jnp.clip(x[:, 0].transpose(1, 2, 0), 0.0, 255.0)
    return jnp.where(do, blurred, image)


def random_crop_zoom(key, image, label, orig_hw, cfg):
    """Device analogue of reference random_crop (data_utils.py:364-399).

    The reference crops an (in_h, in_w) window out of the *original-size*
    image when the original is strictly larger; otherwise it is a no-op
    (resize to the same shape). Our images are already resized to
    (in_h, in_w), so the equivalent operation is: sample the window
    position in original coordinates, then gather that sub-window from the
    resized image with a scale-and-shift nearest warp.

    orig_hw: (2,) float32 original (height, width) per sample.
    """
    k1, k2, k3 = jax.random.split(key, 3)
    h, w = image.shape[0], image.shape[1]
    oh, ow = orig_hw[0], orig_hw[1]
    crop_possible = (oh > h) & (ow > w)
    do = (jax.random.uniform(k1) < cfg.crop_prob) & crop_possible

    # window top-left in original coords: randrange(orig - crop)
    max_y = jnp.maximum(oh - h, 1.0)
    max_x = jnp.maximum(ow - w, 1.0)
    y0 = jnp.floor(jax.random.uniform(k2) * max_y)
    x0 = jnp.floor(jax.random.uniform(k3) * max_x)

    # map dst (x, y) in the crop → resized-image coords:
    # orig coords = (x0 + x, y0 + y); resized = orig * (w / ow, h / oh)
    sx, sy = w / ow, h / oh
    inv = jnp.array([[sx, 0.0, sx * x0], [0.0, sy, sy * y0]])
    cropped_img = affine_nearest(image, inv)
    cropped_lbl = affine_nearest(label, inv)
    return (
        jnp.where(do, cropped_img, image),
        jnp.where(do, cropped_lbl, label),
    )


# ----------------------------------------------------------------------------
# adaptive class weights + full chain
# ----------------------------------------------------------------------------


def adaptive_class_weights(label: jax.Array, max_label: int = 256) -> jax.Array:
    """Per-image 'balanced' class-weight map (reference data.py:134-152).

    sklearn compute_class_weight('balanced'): w_c = n / (k * count_c) with
    n = total pixels, k = number of distinct values present — the
    reference includes the ignore value (255) as a class, reproduced here.
    Returns a float32 weight per pixel, shape = label.shape.
    """
    flat = label.reshape(-1).astype(jnp.int32)
    counts = jnp.bincount(flat, length=max_label)
    present = counts > 0
    k = jnp.sum(present).astype(jnp.float32)
    n = jnp.asarray(flat.size, jnp.float32)
    weights = jnp.where(present, n / (k * jnp.maximum(counts, 1)), 0.0)
    return weights[flat].reshape(label.shape)


def _augment_one(key, image, label, orig_hw, cfg: AugmentConfig):
    keys = jax.random.split(key, 10)
    image = image.astype(jnp.float32)
    label = label.astype(jnp.int32)

    image, label = random_flips(keys[0], image, label, cfg)
    image, label = random_zoom_rotate(keys[1], image, label, cfg)
    image, label = random_gridmask(keys[2], image, label, cfg)
    image = random_brightness(keys[3], image, cfg)
    image = random_chroma(keys[4], image, cfg)
    image = random_contrast(keys[5], image, cfg)
    image = random_sharpness(keys[6], image, cfg)
    image = random_grayscale(keys[7], image, cfg)
    image = random_blur(keys[8], image, cfg)
    image, label = random_crop_zoom(keys[9], image, label, orig_hw, cfg)
    return image, label


@partial(jax.jit, static_argnames=("cfg", "num_classes", "ignore_index"))
def augment_batch(
    key: jax.Array,
    images: jax.Array,  # (B, H, W, 3) uint8/float
    labels: jax.Array,  # (B, H, W) uint8/int
    orig_hw: jax.Array,  # (B, 2) float32 original sizes
    cfg: AugmentConfig = AugmentConfig(),
    num_classes: int = 21,
    ignore_index: int = 255,
):
    """Full augmentation + normalization + adaptive-weight graph.

    Returns (images_norm f32 in [-1, 1], labels int32 with invalid values
    clamped to ignore_index (reference data.py:120), per-pixel weight map).
    """
    batch = images.shape[0]
    keys = jax.random.split(key, batch)
    images, labels = jax.vmap(
        lambda k, i, l, o: _augment_one(k, i, l, o, cfg)
    )(keys, images, labels, orig_hw)

    # normalize to [-1, 1] (reference data_utils.py:403-417)
    images = images * (1.0 / 127.5) - 1.0

    # invalid label values → ignore_index (reference data.py:120)
    labels = jnp.where(labels > num_classes - 1, ignore_index, labels)

    weights = jax.vmap(adaptive_class_weights)(labels)
    return images, labels, weights


@partial(jax.jit, static_argnames=("num_classes", "ignore_index"))
def preprocess_eval_batch(
    images: jax.Array, labels: jax.Array, num_classes: int = 21,
    ignore_index: int = 255,
):
    """No-augment path: normalize + label clamp (reference data.py:109-124
    with augment=False)."""
    images = images.astype(jnp.float32) * (1.0 / 127.5) - 1.0
    labels = labels.astype(jnp.int32)
    labels = jnp.where(labels > num_classes - 1, ignore_index, labels)
    return images, labels
