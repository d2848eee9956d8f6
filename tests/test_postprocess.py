"""CRF / postprocess tests.

pydensecrf is not installable here, so instead of bit-parity we verify the
mean-field fixed point has the reference behaviours: label-noise cleanup,
label-value preservation through the compact/remap cycle
(reference postprocess_np.py:11-27), and edge adherence of the bilateral
term.
"""

import jax.numpy as jnp
import numpy as np

from deeplabv3p_tpu import postprocess as pp

RNG = np.random.RandomState(0)


def test_mask_argmax_and_resize():
    probs = np.zeros((4, 4, 3), np.float32)
    probs[..., 1] = 1.0
    m = np.asarray(pp.mask_argmax(jnp.asarray(probs)))
    assert (m == 1).all()
    resized = np.asarray(pp.mask_resize(jnp.asarray(m), (8, 8)))
    assert resized.shape == (8, 8) and (resized == 1).all()


def test_unary_from_labels_energies():
    labels = jnp.asarray([[0, 1], [1, 0]])
    u = np.asarray(pp.unary_from_labels(labels, 2, gt_prob=0.7))
    np.testing.assert_allclose(u[0, 0, 0], -np.log(0.7), rtol=1e-6)
    np.testing.assert_allclose(u[0, 0, 1], -np.log(0.3), rtol=1e-6)


def test_crf_cleans_salt_noise():
    """A mask with isolated wrong pixels inside a uniform region must be
    cleaned up by the Gaussian pairwise term."""
    h = w = 64
    image = np.full((h, w, 3), 128, np.uint8)
    mask = np.zeros((h, w), np.int32)
    mask[:, w // 2 :] = 1
    noisy = mask.copy()
    idx = RNG.choice(h * w, size=40, replace=False)
    noisy.flat[idx] = 1 - noisy.flat[idx]

    refined = pp.crf_postprocess(image, noisy)
    errors_before = (noisy != mask).sum()
    errors_after = (refined != mask).sum()
    assert errors_after < errors_before * 0.35, (
        f"CRF should clean noise: {errors_before} -> {errors_after}"
    )


def test_crf_preserves_label_values():
    """Non-contiguous label values (e.g. {0, 7, 15}) must survive the
    compact→refine→remap cycle (reference postprocess_np.py:24-27)."""
    h = w = 48
    image = np.full((h, w, 3), 200, np.uint8)
    mask = np.zeros((h, w), np.int32)
    mask[:, 16:32] = 7
    mask[:, 32:] = 15
    refined = pp.crf_postprocess(image, mask)
    assert set(np.unique(refined)).issubset({0, 7, 15})


def test_crf_single_label_noop():
    image = np.zeros((8, 8, 3), np.uint8)
    mask = np.full((8, 8), 3, np.int32)
    out = pp.crf_postprocess(image, mask)
    np.testing.assert_array_equal(out, mask)


def test_crf_edge_adherence():
    """With a strong image edge, the bilateral term should keep the label
    boundary aligned to the image edge rather than smoothing across it."""
    h = w = 64
    image = np.zeros((h, w, 3), np.uint8)
    image[:, w // 2 :] = 255
    # boundary jittered by 2px away from the image edge
    mask = np.zeros((h, w), np.int32)
    mask[:, w // 2 + 2 :] = 1
    refined = pp.crf_postprocess(image, mask)
    # majority of the 2px strip adjacent to the edge should flip to 1
    strip = refined[:, w // 2 : w // 2 + 2]
    assert strip.mean() > 0.4, f"edge adherence too weak: {strip.mean():.3f}"
