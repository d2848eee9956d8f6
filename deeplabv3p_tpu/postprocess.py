"""Prediction post-processing: argmax, mask resize, dense-CRF refinement.

The reference's CRF (/root/reference/deeplabv3p/postprocess_np.py:10-28)
wraps pydensecrf (CPU C++, permutohedral-lattice bilateral filtering):
unary from labels (gt_prob=0.7), pairwise Gaussian (sxy=3, compat=3) +
bilateral (sxy=80, srgb=13, compat=10), 5 mean-field iterations.

TPU-native re-design (BASELINE.json north star: "numpy dense-CRF
postprocess rewritten as an iterative message-passing kernel"):

* Gaussian pairwise term → depthwise convolution of Q with a truncated
  spatial Gaussian (sigma 3 → 13x13 taps covers >4 sigma);
* bilateral term → color-guided bilateral grid: Q is splatted into a
  coarse (H/step, W/step, r-bin, g-bin, b-bin) grid, blurred over
  space+color with the (sxy=80, srgb=13) sigmas, and sliced back. This is
  the classic real-time-bilateral approximation of the permutohedral
  filter, in pydensecrf's FULL RGB feature space (a 1-D luminance
  projection remains as the cheaper `color_features="luma"` path);
  grid-vs-exact-oracle agreement is quantified in tests/test_crf_parity.py
  and tools/misc/crf_parity_study.py;
* Potts compatibility: message_a = sum_{b != a} (k (*) Q)_b, applied with
  the reference's compat weights.

Everything is one jitted program over static shapes; 5 iterations unroll
into a single fused XLA computation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from deeplabv3p_tpu.ops.resize import resize_nearest


def mask_argmax(probs_or_logits: jax.Array) -> jax.Array:
    """(..., C) → (...) int32 predicted mask (reference deeplab.py:99)."""
    return jnp.argmax(probs_or_logits, axis=-1).astype(jnp.int32)


def mask_resize(mask: jax.Array, target_hw: tuple[int, int]) -> jax.Array:
    """Nearest resize of an (H, W) mask to target size, cv2 convention
    (reference common/data_utils.py:457-477)."""
    return resize_nearest(mask, target_hw, convention="cv2")


def unary_from_labels(
    labels: jax.Array, n_labels: int, gt_prob: float = 0.7
) -> jax.Array:
    """Negative-log unary energies from a hard labeling, matching
    pydensecrf.utils.unary_from_labels with zero_unsure=False
    (reference postprocess_np.py:15)."""
    p_energy = -np.log(gt_prob)
    n_energy = -np.log((1.0 - gt_prob) / (n_labels - 1))
    one_hot = jax.nn.one_hot(labels, n_labels, dtype=jnp.float32)
    return one_hot * p_energy + (1.0 - one_hot) * n_energy


def _gaussian_taps1d(sigma: float, radius: int) -> np.ndarray:
    """Raw truncated-Gaussian 1-D taps (self loop INCLUDED, unnormalized
    — normalization is the per-pixel symmetric D^-1/2 K D^-1/2 applied
    in _spatial_message, matching pydensecrf/densecrf2 kernel semantics;
    see crf_exact_dense). The 2-D kernel is the outer product, applied
    SEPARABLY in _spatial_conv (exact: zero-padded 2-D conv with an
    outer-product kernel == two 1-D convs), 2*(2r+1) taps instead of
    (2r+1)^2 — 1-in/1-out spatial convs have no channel contraction for
    the MXU, so tap count is the cost."""
    xs = np.arange(-radius, radius + 1)
    return np.exp(-(xs**2) / (2.0 * sigma**2)).astype(np.float32)


def _spatial_conv(x: jax.Array, taps: jax.Array) -> jax.Array:
    """Separable per-channel conv of (H, W, C) with the 1-D Gaussian
    taps: channels ride the batch dimension, so one (1-in, 1-out) conv
    covers all of them; height then width pass."""
    xt = x.transpose(2, 0, 1)[:, None]  # (C, 1, H, W)
    for k in (taps[None, None, :, None], taps[None, None, None, :]):
        xt = jax.lax.conv_general_dilated(
            xt, k, (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
    return xt[:, 0].transpose(1, 2, 0)


def _spatial_message(q: jax.Array, kernel: jax.Array,
                     rs: jax.Array) -> jax.Array:
    """Symmetric-normalized spatial message D^-1/2 K (D^-1/2 Q): rs is
    the precomputed per-pixel 1/sqrt(K @ 1) (truncation-aware — at the
    image border the kernel mass shrinks and rs grows to compensate,
    exactly like the dense oracle's row sums)."""
    return rs * _spatial_conv(q * rs, kernel)


def _bilateral_grid_filter(
    q: jax.Array, color: jax.Array, sxy: float, srgb: float,
    space_step: int, n_bins: int,
) -> jax.Array:
    """Raw (unnormalized) color-guided bilateral filter K @ Q of
    (H, W, C) values via a coarse grid: splat → gaussian blur over
    (gy, gx, *bins) → slice. `color` is (H, W, F): F=1 is the fast
    luminance-projected grid, F=3 the full-RGB grid whose product-
    separable color blur matches pydensecrf's exp(-|Δrgb|²/2σ²) kernel
    with no projection (n_bins applies PER CHANNEL — the composite grid
    is n_bins**F wide, so rgb wants n_bins≈8). Grid cell sizes are
    chosen so the reference sigmas become ~2 cells, keeping the blur
    kernels tiny. Normalization is the caller's job (crf_inference
    applies the symmetric D^-1/2 K D^-1/2 with D = this filter of ones,
    computed once per image — pydensecrf's kernel normalization; see
    crf_exact_dense)."""
    h, w, c = q.shape
    n_feat = color.shape[-1]
    nb = n_bins ** n_feat  # composite color-bin count

    # A pixel's spatial cell is ys//step, xs//step — i.e. cells are
    # CONTIGUOUS step x step pixel blocks, so the spatial dimension of
    # the splat is a free reshape, not a one-hot contraction. That
    # leaves only the color binning, a per-block (p, nb)^T @ (p, c)
    # batched matmul on the MXU: FLOPs 2*N*nb*c instead of the round-4
    # factored-one-hot design's 2*N*n_pos*nb*c (~1000x fewer at 512^2;
    # what makes the F=3 full-RGB grid affordable, VERDICT r4 #3).
    # Operands are bf16 (one-hot masks exact; Q rounds at ~3 decimal
    # digits, far inside CRF tolerance — tests/test_crf_parity.py) with
    # f32 accumulation.
    ph, pw = -h % space_step, -w % space_step
    qp = jnp.pad(q, ((0, ph), (0, pw), (0, 0)))  # zero Q: no cell mass
    colorp = jnp.pad(color, ((0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    gh, gw = hp // space_step, wp // space_step
    n_blocks = gh * gw
    p = space_step * space_step

    bins_fp = jnp.clip(
        (colorp / (256.0 / n_bins)).astype(jnp.int32), 0, n_bins - 1
    )  # (hp, wp, F)

    def to_blocks(x):  # (hp, wp, k) -> (n_blocks, p, k)
        k = x.shape[-1]
        return (
            x.reshape(gh, space_step, gw, space_step, k)
            .transpose(0, 2, 1, 3, 4)
            .reshape(n_blocks, p, k)
        )

    bins_b = to_blocks(bins_fp)
    vals_b = to_blocks(qp).astype(jnp.bfloat16)

    # chunk blocks so the (chunk, p, nb) composite one-hot tile stays
    # bounded (~32 MB bf16) — nb = n_bins**3 in rgb mode
    blk_chunk = n_blocks
    while blk_chunk > 1 and blk_chunk * p * nb * 2 > 34e6:
        blk_chunk //= 2
    n_chunks = -(-n_blocks // blk_chunk)
    pad_b = n_chunks * blk_chunk - n_blocks
    if pad_b:
        bins_b = jnp.pad(bins_b, ((0, pad_b), (0, 0), (0, 0)))
        vals_b = jnp.pad(vals_b, ((0, pad_b), (0, 0), (0, 0)))

    bin_ids = jax.lax.broadcasted_iota(
        jnp.int32, (blk_chunk, p, n_bins), 2
    )

    def body(_, inp):
        bin_c, val_c = inp  # (chunk, p, F), (chunk, p, c)
        mask = (bin_c[..., 0][..., None] == bin_ids).astype(jnp.bfloat16)
        for f in range(1, n_feat):
            m_f = (bin_c[..., f][..., None] == bin_ids).astype(jnp.bfloat16)
            mask = (mask[..., :, None] * m_f[..., None, :]).reshape(
                blk_chunk, p, -1
            )
        g = jnp.einsum(
            "bpn,bpc->bnc", mask, val_c,
            preferred_element_type=jnp.float32,
        )
        return None, g

    _, grids = jax.lax.scan(
        body, None,
        (bins_b.reshape(n_chunks, blk_chunk, p, n_feat),
         vals_b.reshape(n_chunks, blk_chunk, p, c)),
    )
    q_grid = grids.reshape(n_chunks * blk_chunk, nb, c)[:n_blocks]

    # slice-back indices for the REAL (unpadded) pixels
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) // space_step
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) // space_step
    comp = bins_fp[:h, :w, 0]
    for f in range(1, n_feat):
        comp = comp * n_bins + bins_fp[:h, :w, f]
    flat_idx = (ys * gw + xs) * nb + comp  # (h, w)
    grid_size = gh * gw * nb

    # blur over grid: sigma in grid units
    s_space = sxy / space_step
    s_luma = srgb / (256.0 / n_bins)

    def _shift(x, s, axis):
        """Zero-padded (non-wrapping) shift along axis."""
        if s == 0:
            return x
        pad = [(0, 0)] * x.ndim
        n = x.shape[axis]
        if s > 0:
            pad[axis] = (s, 0)
            return jax.lax.slice_in_dim(jnp.pad(x, pad), 0, n, axis=axis)
        pad[axis] = (0, -s)
        return jax.lax.slice_in_dim(jnp.pad(x, pad), -s, n - s, axis=axis)

    def blur_axis(x, sigma, axis):
        """Truncated-Gaussian blur along one grid axis: bf16 reads with
        f32 tap accumulation — the 5-D rgb grid makes this pass
        HBM-traffic-bound, and the grid masses tolerate bf16 (CRF
        parity thresholds hold, tests/test_crf_parity.py)."""
        radius = max(1, int(np.ceil(2 * sigma)))
        taps = np.exp(
            -(np.arange(-radius, radius + 1) ** 2) / (2 * sigma**2)
        ).astype(np.float32)
        taps /= taps.sum()
        out = jnp.zeros(x.shape, jnp.float32)
        for i, t in enumerate(taps):
            out = out + t * _shift(x, i - radius, axis).astype(jnp.float32)
        return out.astype(x.dtype)

    shaped_q = q_grid.reshape(
        (gh, gw) + (n_bins,) * n_feat + (c,)
    ).astype(jnp.bfloat16)
    axes = [(0, s_space), (1, s_space)]
    axes += [(2 + f, s_luma) for f in range(n_feat)]
    for axis, sigma in axes:
        shaped_q = blur_axis(shaped_q, sigma, axis)

    sliced_q = shaped_q.reshape(grid_size, c)[flat_idx.reshape(-1)]
    return sliced_q.reshape(h, w, c).astype(jnp.float32)


@partial(
    jax.jit,
    static_argnames=(
        "n_iters", "sxy_gaussian", "compat_gaussian", "sxy_bilateral",
        "srgb_bilateral", "compat_bilateral", "space_step", "n_bins",
        "color_features",
    ),
)
def crf_inference(
    unary: jax.Array,  # (H, W, C) negative-log unaries
    image: jax.Array,  # (H, W, 3) float 0..255
    n_iters: int = 5,
    sxy_gaussian: float = 3.0,
    compat_gaussian: float = 3.0,
    sxy_bilateral: float = 80.0,
    srgb_bilateral: float = 13.0,
    compat_bilateral: float = 10.0,
    space_step: int = 16,
    n_bins: int | None = None,
    color_features: str = "rgb",
) -> jax.Array:
    """Mean-field dense-CRF inference; returns Q (H, W, C).

    color_features picks the bilateral grid's color space:
      * "rgb" (default): full 3-D color grid (5-D with space) — matches
        pydensecrf's exp(-|Δrgb|²/2σ²) feature space with NO
        projection; the parity mode (VERDICT r4 #3 — the round-4 luma
        default capped argmax agreement with the exact RGB oracle at
        0.862 on 2007_000346; rgb removes that ceiling, see
        tools/misc/crf_parity_study.py --features rgb).
      * "luma": 1-D luminance projection — the fast path (one 3-D
        grid), exact whenever the labels' colors separate in
        luminance (measured, ROUND4_NOTES.md).
    space_step/n_bins control the grid resolution (n_bins per color
    channel; default 8 for rgb — composite grid 512 wide — and 16 for
    luma; both sit on the converged plateau of the sensitivity sweep vs
    the exact dense oracle, tools/misc/crf_parity_study.py)."""
    if n_bins is None:
        n_bins = 16 if color_features == "luma" else 8
    radius = int(np.ceil(3 * sxy_gaussian))
    g_kernel = jnp.asarray(_gaussian_taps1d(sxy_gaussian, radius))
    if color_features == "rgb":
        color = image
    else:
        color = (
            image[..., 0] * 0.299 + image[..., 1] * 0.587
            + image[..., 2] * 0.114
        )[..., None]

    # per-pixel symmetric normalizers 1/sqrt(K @ 1) — constant across
    # mean-field iterations, computed once per image
    ones1 = jnp.ones(unary.shape[:2] + (1,), jnp.float32)
    rs_gauss = jax.lax.rsqrt(
        jnp.maximum(_spatial_conv(ones1, g_kernel), 1e-20)
    )
    grid_kw = dict(
        sxy=sxy_bilateral, srgb=srgb_bilateral,
        space_step=space_step, n_bins=n_bins,
    )
    rs_bilat = jax.lax.rsqrt(
        jnp.maximum(_bilateral_grid_filter(ones1, color, **grid_kw), 1e-20)
    )

    q = jax.nn.softmax(-unary, axis=-1)
    for _ in range(n_iters):
        m_gauss = _spatial_message(q, g_kernel, rs_gauss)
        m_bilat = rs_bilat * _bilateral_grid_filter(
            q * rs_bilat, color, **grid_kw
        )
        # Potts: penalty for label a = sum_{b != a} message_b
        agg = compat_gaussian * m_gauss + compat_bilateral * m_bilat
        pairwise = jnp.sum(agg, axis=-1, keepdims=True) - agg
        q = jax.nn.softmax(-unary - pairwise, axis=-1)
    return q


def crf_exact_dense(
    unary: np.ndarray,  # (H, W, C) negative-log unaries
    image: np.ndarray,  # (H, W, 3) float 0..255
    n_iters: int = 5,
    sxy_gaussian: float = 3.0,
    compat_gaussian: float = 3.0,
    sxy_bilateral: float = 80.0,
    srgb_bilateral: float = 13.0,
    compat_bilateral: float = 10.0,
    bilateral_features: str = "rgb",  # "rgb" (pydensecrf) | "luma"
) -> np.ndarray:
    """Exact O(N^2) dense mean-field CRF — the mathematical target that
    pydensecrf's permutohedral lattice itself only APPROXIMATES
    (Krahenbuhl & Koltun, NIPS'11; reference postprocess_np.py:10-28
    wraps that approximation). pydensecrf is not installable in this
    environment, so this brute-force oracle is the parity ground truth
    for crf_inference's bilateral-grid approximation (tests/
    test_crf_parity.py quantifies the agreement VERDICT r3 #4 asked for).

    Semantics follow pydensecrf's defaults (densecrf2 kernel.cpp):
    full pairwise kernel INCLUDING the self loop (the lattice filters a
    pixel's own value back), symmetric normalization
    K~ = D^-1/2 K D^-1/2 with D = K @ 1, Potts compatibility, update
    Q <- softmax(-U + sum_k compat_k * (K~_k @ Q)) — the Potts
    "penalize every other label" form differs from this by a per-pixel
    constant that softmax cancels.

    Builds (N, N) kernels: small images only (N = H*W <= ~30k).

    bilateral_features="luma" restricts the color distance to the
    BT.601 luminance crf_inference's grid uses — comparing both oracle
    flavors decomposes grid-approximation error from luma-projection
    error.
    """
    h, w, c = unary.shape
    n = h * w
    ys, xs = np.mgrid[0:h, 0:w]
    pos = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float64)
    img = np.asarray(image, np.float64).reshape(n, 3)
    if bilateral_features == "luma":
        img = (img @ np.array([0.299, 0.587, 0.114]))[:, None]

    def ktilde(feat):
        sq = np.einsum("nd,nd->n", feat, feat)
        d2 = sq[:, None] + sq[None, :] - 2.0 * (feat @ feat.T)
        k = np.exp(-0.5 * np.maximum(d2, 0.0))
        d = k.sum(axis=1)
        inv_sqrt = 1.0 / np.sqrt(d + 1e-20)
        return (k * inv_sqrt[:, None]) * inv_sqrt[None, :]

    kg = ktilde(pos / sxy_gaussian)
    kb = ktilde(
        np.concatenate([pos / sxy_bilateral, img / srgb_bilateral], -1)
    )
    u = np.asarray(unary, np.float64).reshape(n, c)

    def softmax(z):
        z = z - z.max(axis=1, keepdims=True)
        e = np.exp(z)
        return e / e.sum(axis=1, keepdims=True)

    q = softmax(-u)
    for _ in range(n_iters):
        q = softmax(-u + compat_gaussian * (kg @ q)
                    + compat_bilateral * (kb @ q))
    return q.reshape(h, w, c).astype(np.float32)


def crf_postprocess(
    image: np.ndarray, mask: np.ndarray, n_iters: int = 5, gt_prob: float = 0.7
) -> np.ndarray:
    """Drop-in equivalent of reference crf_postprocess
    (postprocess_np.py:10-28): refines a hard label mask using the image,
    preserving the original label values (the reference compacts labels to
    0..n-1, runs CRF, then maps back)."""
    colors, inv = np.unique(mask, return_inverse=True)
    n_labels = len(colors)
    if n_labels < 2:
        return mask.copy()
    labels = inv.reshape(mask.shape)
    unary = unary_from_labels(jnp.asarray(labels), n_labels, gt_prob)
    q = crf_inference(unary, jnp.asarray(image, jnp.float32), n_iters=n_iters)
    out = np.asarray(mask_argmax(q))
    return colors[out]
