"""Device-augmentation parity tests against the actual PIL/cv2/sklearn ops
the reference uses (/root/reference/common/data_utils.py,
/root/reference/deeplabv3p/data.py:134-152)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplabv3p_tpu.data import augment as A

RNG = np.random.RandomState(7)
H, W = 33, 41


@pytest.fixture
def image():
    return RNG.randint(0, 256, size=(H, W, 3)).astype(np.float32)


def test_pil_grayscale_parity(image):
    from PIL import Image

    got = np.asarray(A._pil_grayscale_l(jnp.asarray(image)))
    pil = np.asarray(Image.fromarray(image.astype(np.uint8)).convert("L"))
    # PIL truncates to int; we keep float — match within 1 level
    assert np.max(np.abs(got - pil)) <= 1.0


def test_brightness_is_scaling(image):
    out = A._blend(jnp.zeros_like(jnp.asarray(image)), jnp.asarray(image), 0.7)
    np.testing.assert_allclose(np.asarray(out), np.clip(image * 0.7, 0, 255), atol=1e-3)


def test_contrast_parity(image):
    from PIL import Image, ImageEnhance

    factor = 1.37
    img_u8 = image.astype(np.uint8)
    expected = np.asarray(
        ImageEnhance.Contrast(Image.fromarray(img_u8)).enhance(factor)
    ).astype(np.float32)
    x = jnp.asarray(img_u8.astype(np.float32))
    mean = jnp.floor(jnp.mean(A._pil_grayscale_l(x)) + 0.5)
    got = np.asarray(A._blend(jnp.full_like(x, mean), x, factor))
    # PIL rounds to uint8 per pixel; allow 1.5 quantization error
    assert np.max(np.abs(got - expected)) <= 1.5


def test_chroma_parity(image):
    from PIL import Image, ImageEnhance

    factor = 0.6
    img_u8 = image.astype(np.uint8)
    expected = np.asarray(
        ImageEnhance.Color(Image.fromarray(img_u8)).enhance(factor)
    ).astype(np.float32)
    x = jnp.asarray(img_u8.astype(np.float32))
    gray = A._pil_grayscale_l(x)[..., None] * jnp.ones((1, 1, 3))
    got = np.asarray(A._blend(gray, x, factor))
    assert np.max(np.abs(got - expected)) <= 2.0


def test_smooth_filter_parity(image):
    from PIL import Image, ImageFilter

    img_u8 = image.astype(np.uint8)
    expected = np.asarray(
        Image.fromarray(img_u8).filter(ImageFilter.SMOOTH)
    ).astype(np.float32)
    got = np.asarray(A._smooth_filter(jnp.asarray(img_u8.astype(np.float32))))
    assert np.max(np.abs(got - expected)) <= 1.0


def test_gaussian_blur_parity(image):
    cv2 = pytest.importorskip("cv2")
    img_u8 = image.astype(np.uint8)
    expected = cv2.GaussianBlur(img_u8, (5, 5), 0).astype(np.float32)

    cfg = dataclasses.replace(A.AugmentConfig(), blur_prob=1.1)
    got = np.asarray(
        A.random_blur(jax.random.PRNGKey(0), jnp.asarray(image), cfg)
    )
    # cv2 works on uint8 with rounding; we blur floats
    assert np.max(np.abs(got - expected)) <= 1.5


def test_affine_rotation_parity_with_cv2(image):
    cv2 = pytest.importorskip("cv2")
    angle, scale = 17.0, 1.15
    M = cv2.getRotationMatrix2D((W // 2, H // 2), angle, scale)
    expected = cv2.warpAffine(
        image, M, (W, H), flags=cv2.INTER_NEAREST,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0,
    )
    inv = A._rotation_inv_matrix(W // 2, H // 2, angle, scale)
    got = np.asarray(A.affine_nearest(jnp.asarray(image), inv))
    # nearest sampling: identical except ties at half-pixel boundaries
    mismatch = np.mean(np.any(got != expected, axis=-1))
    assert mismatch < 0.03, f"too many mismatching pixels: {mismatch:.4f}"


def test_flips_forced():
    cfg = dataclasses.replace(A.AugmentConfig(), flip_prob=1.1, vflip_prob=-1.0)
    img = jnp.arange(H * W * 3, dtype=jnp.float32).reshape(H, W, 3)
    lbl = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W) % 5
    out_img, out_lbl = A.random_flips(jax.random.PRNGKey(0), img, lbl, cfg)
    np.testing.assert_array_equal(np.asarray(out_img), np.asarray(img)[:, ::-1])
    np.testing.assert_array_equal(np.asarray(out_lbl), np.asarray(lbl)[:, ::-1])


def test_gridmask_joint_masking(image):
    cfg = dataclasses.replace(A.AugmentConfig(), gridmask_prob=1.1)
    img = jnp.asarray(image) + 1.0  # strictly positive
    lbl = jnp.ones((H, W), jnp.int32)
    out_img, out_lbl = A.random_gridmask(jax.random.PRNGKey(3), img, lbl, cfg)
    out_img, out_lbl = np.asarray(out_img), np.asarray(out_lbl)
    dropped = out_img.sum(-1) == 0
    assert dropped.any(), "gridmask should drop some pixels"
    assert not dropped.all()
    # label zeroed exactly where image dropped (reference data_utils.py:332-333)
    np.testing.assert_array_equal(out_lbl == 0, dropped)


def test_adaptive_weights_match_sklearn():
    from sklearn.utils import class_weight

    label = RNG.randint(0, 4, size=(H, W)).astype(np.int32)
    label[:5] = 255  # ignore region participates as a class (data.py:134)
    got = np.asarray(A.adaptive_class_weights(jnp.asarray(label)))

    flat = label.flatten()
    classes = np.unique(flat)
    cw = class_weight.compute_class_weight(
        class_weight="balanced", classes=classes, y=flat
    )
    lut = {c: w for c, w in zip(classes, cw)}
    expected = np.vectorize(lut.get)(label).astype(np.float32)
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_crop_noop_when_original_smaller(image):
    cfg = dataclasses.replace(A.AugmentConfig(), crop_prob=1.1)
    img = jnp.asarray(image)
    lbl = jnp.zeros((H, W), jnp.int32)
    orig = jnp.array([H / 2, W / 2], jnp.float32)  # smaller than input
    out_img, out_lbl = A.random_crop_zoom(
        jax.random.PRNGKey(0), img, lbl, orig, cfg
    )
    np.testing.assert_array_equal(np.asarray(out_img), image)


def test_augment_batch_end_to_end():
    B = 4
    key = jax.random.PRNGKey(0)
    images = jnp.asarray(RNG.randint(0, 256, size=(B, H, W, 3)), jnp.uint8)
    labels = jnp.asarray(RNG.randint(0, 30, size=(B, H, W)), jnp.uint8)
    orig = jnp.full((B, 2), 600.0, jnp.float32)
    cfg = A.AugmentConfig()
    imgs, lbls, w = A.augment_batch(
        key, images, labels, orig, cfg, num_classes=21, ignore_index=255
    )
    assert imgs.shape == (B, H, W, 3) and imgs.dtype == jnp.float32
    assert lbls.shape == (B, H, W) and lbls.dtype == jnp.int32
    assert w.shape == (B, H, W)
    eps = 1e-5  # 255/127.5 - 1 rounds just past 1.0 in fp32
    assert float(imgs.min()) >= -1.0 - eps and float(imgs.max()) <= 1.0 + eps
    lbls_np = np.asarray(lbls)
    assert set(np.unique(lbls_np)).issubset(set(range(21)) | {255})
    # deterministic under same key
    imgs2, _, _ = A.augment_batch(
        key, images, labels, orig, cfg, num_classes=21, ignore_index=255
    )
    np.testing.assert_array_equal(np.asarray(imgs), np.asarray(imgs2))


def test_eval_preprocess():
    images = jnp.full((1, 8, 8, 3), 255, jnp.uint8)
    labels = jnp.full((1, 8, 8), 22, jnp.uint8)
    imgs, lbls = A.preprocess_eval_batch(images, labels, num_classes=21)
    np.testing.assert_allclose(np.asarray(imgs), 1.0, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(lbls), 255)
