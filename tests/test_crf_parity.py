"""Quantitative CRF parity vs the exact dense mean-field oracle.

pydensecrf (reference postprocess_np.py:10-28) is not installable in
this environment, and its permutohedral lattice is itself an
approximation — so the parity ground truth here is
`postprocess.crf_exact_dense`, the brute-force O(N^2) dense mean field
both implementations approximate (Krahenbuhl & Koltun, NIPS'11).

Three tiers, decomposing the approximation error of `crf_inference`:

1. spatial-only (compat_bilateral=0): the truncated-conv spatial
   message vs the dense kernel — only truncation error remains, so the
   match is tight (q_mae ~1e-4 measured, asserted <1e-3).
2. bilateral-only (compat_gaussian=0) vs the LUMA-feature oracle: pure
   bilateral-GRID error, the luma projection shared by construction.
3. full reference parameters on a real example/ pair vs the RGB oracle
   (what pydensecrf computes): argmax agreement overall and on the
   pixels the oracle actually changed.

Thresholds are pinned just under values measured on this suite's exact
inputs (tools/misc/crf_parity_study.py has the wider sweep; see
ROUND4_NOTES.md for the measured tables).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from deeplabv3p_tpu import postprocess as pp


def _example_pair(h, w, stem="2007_000039"):
    PIL = pytest.importorskip("PIL.Image")
    img = PIL.open(f"example/{stem}.jpg").resize((w, h), PIL.BILINEAR)
    lbl = PIL.open(f"example/{stem}.png").resize((w, h), PIL.NEAREST)
    labels = np.asarray(lbl)
    vals, inv = np.unique(labels, return_inverse=True)
    return (
        np.asarray(img, np.float32),
        inv.reshape(labels.shape).astype(np.int32),
        len(vals),
    )


def _agree(a, b, sel=None):
    if sel is not None:
        a, b = a[sel], b[sel]
    return float((a == b).mean())


def test_spatial_message_matches_dense_oracle():
    """Gaussian-only mean field: conv message (truncated at 3 sigma,
    symmetric-normalized) vs the exact dense kernel."""
    h, w = 40, 56
    rng = np.random.RandomState(0)
    labels = (rng.rand(h, w) > 0.5).astype(np.int32)
    image = np.full((h, w, 3), 127.0, np.float32)
    unary = np.asarray(pp.unary_from_labels(jnp.asarray(labels), 2))
    params = dict(
        n_iters=5, sxy_gaussian=3.0, compat_gaussian=3.0,
        compat_bilateral=0.0, sxy_bilateral=80.0, srgb_bilateral=13.0,
    )
    q_grid = np.asarray(
        pp.crf_inference(jnp.asarray(unary), jnp.asarray(image), **params)
    )
    q_ref = pp.crf_exact_dense(unary, image, **params)
    mae = float(np.abs(q_grid - q_ref).mean())
    assert mae < 1e-3, f"spatial-only q_mae {mae:.2e}"
    assert _agree(q_grid.argmax(-1), q_ref.argmax(-1)) > 0.995


def test_bilateral_grid_matches_luma_oracle():
    """Bilateral-only mean field on an edge image: the coarse grid vs
    the dense oracle with the SAME luma features — isolates pure
    grid-quantization error."""
    h, w = 40, 56
    image = np.zeros((h, w, 3), np.float32)
    image[:, w // 2:] = 255.0
    labels = np.zeros((h, w), np.int32)
    labels[:, w // 2 + 2:] = 1  # boundary jittered off the image edge
    unary = np.asarray(pp.unary_from_labels(jnp.asarray(labels), 2))
    params = dict(
        n_iters=5, sxy_gaussian=3.0, compat_gaussian=0.0,
        compat_bilateral=10.0, sxy_bilateral=10.0, srgb_bilateral=13.0,
    )
    q_grid = np.asarray(pp.crf_inference(
        jnp.asarray(unary), jnp.asarray(image),
        space_step=4, n_bins=8, color_features="luma", **params,
    ))
    q_ref = pp.crf_exact_dense(
        unary, image, bilateral_features="luma", **params
    )
    mae = float(np.abs(q_grid - q_ref).mean())
    agree = _agree(q_grid.argmax(-1), q_ref.argmax(-1))
    assert agree > 0.97, f"bilateral-only argmax agreement {agree:.4f}"
    assert mae < 0.05, f"bilateral-only q_mae {mae:.3f}"


@pytest.mark.parametrize("stem", ["2007_000039", "2007_000346"])
def test_full_crf_parity_on_example_pair(stem):
    """Full mean field (both kernels, reference compat/srgb, sigmas at
    the reference's sigma-to-image ratio) on the downscaled example/
    pairs vs the RGB-feature dense oracle (= pydensecrf's target), in
    the DEFAULT rgb grid mode. Round 4's luma default capped agreement
    at 0.86 on 2007_000346 (the luma-projection ceiling); the rgb grid
    removes that ceiling (VERDICT r4 #3)."""
    h, w = 48, 64
    image, labels, n_labels = _example_pair(h, w, stem)
    unary = np.asarray(pp.unary_from_labels(jnp.asarray(labels), n_labels))
    scale = 500.0 / w
    params = dict(
        n_iters=5, sxy_gaussian=3.0, compat_gaussian=3.0,
        sxy_bilateral=80.0 / scale, srgb_bilateral=13.0,
        compat_bilateral=10.0,
    )
    q_grid = np.asarray(pp.crf_inference(
        jnp.asarray(unary), jnp.asarray(image),
        space_step=4, **params,
    ))
    q_rgb = pp.crf_exact_dense(unary, image, **params)
    m_g, m_rgb = q_grid.argmax(-1), q_rgb.argmax(-1)
    delta = m_rgb != labels  # the pixels CRF is actually for
    assert delta.any(), "oracle changed nothing — test inputs degenerate"
    agree_all = _agree(m_g, m_rgb)
    agree_delta = _agree(m_g, m_rgb, delta)
    assert agree_all > 0.95, f"overall argmax agreement {agree_all:.4f}"
    assert agree_delta > 0.75, f"changed-pixel agreement {agree_delta:.4f}"
