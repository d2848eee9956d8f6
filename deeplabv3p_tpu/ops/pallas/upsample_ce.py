"""Fused bilinear-upsample + cross-entropy + confusion train-loss tail.

THE train step's HBM hot spot (measured, tools/evaluation/
train_phase_profile.py on v5e): every DeepLab family upsamples its
low-res logits (OS8: 64x64x21, 2.75 MB at b16) to input resolution for
the loss (reference model.py:76 pred_resize + loss.py CE) — at 512px/b16
that materializes a 352 MB f32 tensor which the CE reads again, the
metric argmax reads again, and the backward writes again as the CE grad
before the resize-transpose reduces it back to OS8. Attaching the loss
to the forward costs +3.2 ms at 88.6% of HBM peak — pure bandwidth, no
math.

This kernel never materializes full resolution in HBM. Per (batch,
row-tile) grid step it holds the WHOLE low-res logits slab in VMEM
(<=1.4 MB even at OS4) and:

  upsample   two small MXU matmuls against precomputed half-pixel
             interpolation matrices R_h (TH, h), R_w (W, w) — bilinear
             upsample IS a separable linear map, exactly
             ops/resize.resize_bilinear (verified to 1e-5 in tests);
  CE         logsumexp - target logit per pixel, ignore/UNK labels zero
             (losses.py:33-71 semantics), optional static class weights
             (weighted CE, losses.py:74-90) and per-pixel sample
             weights (adaptive maps);
  argmax     lowest-index argmax per pixel, written as (B, H, W) int32
             preds — 21x smaller than the logits. The train jaccard is
             then metrics.jaccard_from_preds outside the kernel (a one-
             hot matmul over int preds, measured ~free), so nothing
             downstream needs full-res logits either. (The confusion
             matrix itself is NOT accumulated in-kernel: its pixel
             contraction spans the (row, column) tile dims and Mosaic's
             tpu.matmul supports a single contracting dim only.)

Backward (custom VJP, same tiling): d_logits_lr = R_h^T [(softmax(up) -
onehot) * w_px * g] R_w, recomputing the upsampled tile in VMEM. HBM
traffic per step drops from ~1 GB to ~70 MB (labels + weights + low-res
logits), i.e. the whole loss+metric tail rides VMEM.

TPU status: interpret-mode parity is pinned by tests; on real TPU the
current formulation still trips Mosaic layout inference — the
(h, w, c)->(h, w*c) reshape feeding the first upsample matmul merges
the lane dim ("infer-vector-layout: unsupported shape cast"). The
Mosaic-clean reformulation (logits passed (B, C, h, w); per-class 2-D
matmuls with ONLINE logsumexp/argmax across the class loop — no
reshapes, no >2-D contractions) is the planned fix.

Off-TPU the kernel runs under interpret=True (CPU-mesh tests).
Gradients w.r.t. labels/sample/class weights are NOT provided (zeros) —
this is a train-loss kernel, only the logits path is differentiated.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def interp_matrix(out_size: int, in_size: int) -> np.ndarray:
    """(out, in) half-pixel-centers bilinear interpolation matrix.

    For upsampling this reproduces jax.image.resize(method='linear')
    (= tf.image.resize bilinear, the reference's pred_resize) exactly:
    two taps per output row, edge taps clamped (weights still sum to 1).
    """
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    frac = src - i0
    mat = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    np.add.at(mat, (rows, np.clip(i0, 0, in_size - 1)), (1.0 - frac))
    np.add.at(mat, (rows, np.clip(i0 + 1, 0, in_size - 1)), frac)
    return mat


def _pick_tile(h_out: int, cap: int = 32) -> int:
    """Largest divisor of h_out <= cap (prefer multiples of 8)."""
    best = 1
    for d in range(1, min(cap, h_out) + 1):
        if h_out % d == 0 and (d % 8 == 0 or best < 8):
            best = d
    return best


def _upsample_tile(z_lr, rh, rw, c):
    """(h, w, C), (TH, h), (W, w) -> (TH, C, W) f32 upsampled logits."""
    h, w = z_lr.shape[0], z_lr.shape[1]
    a = jax.lax.dot_general(
        rh, z_lr.reshape(h, w * c), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TH, w*C)
    a = a.reshape(rh.shape[0], w, c)
    return jax.lax.dot_general(
        a, rw, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TH, C, W)


def _pixel_weight(labels, t_oh, cw_ref, sw, c):
    """Per-pixel loss weight: class_weight[label] * sample_weight for
    valid labels (0 <= l < C), 0 otherwise — exactly losses.py's
    one_hot-zero + ignore-mask semantics folded into one factor."""
    validv = (labels >= 0) & (labels < c)
    cwpx = jnp.sum(
        jnp.where(t_oh, cw_ref[...].reshape(1, c, 1), 0.0), axis=1
    )  # (TH, W); 0 when no one-hot row
    return jnp.where(validv, cwpx * sw, 0.0), validv


def _fwd_kernel(logits_ref, labels_ref, sw_ref, cw_ref, rh_ref, rw_ref,
                loss_ref, pred_ref, *, c: int):
    bi, ti = pl.program_id(0), pl.program_id(1)
    z = _upsample_tile(logits_ref[0], rh_ref[...], rw_ref[...], c)
    th, _, wo = z.shape
    labels = labels_ref[0]  # (TH, W) int32
    sw = sw_ref[0]  # (TH, W) f32

    m = jnp.max(z, axis=1, keepdims=True)  # (TH, 1, W)
    lse = jnp.log(jnp.sum(jnp.exp(z - m), axis=1)) + m[:, 0, :]
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (th, c, wo), 1)
    t_oh = labels[:, None, :] == iota_c
    zl = jnp.sum(jnp.where(t_oh, z, 0.0), axis=1)  # target logit
    w_px, validv = _pixel_weight(labels, t_oh, cw_ref, sw, c)
    tile_loss = jnp.sum(jnp.where(validv, lse - zl, 0.0) * w_px)

    # full-(1,1)-block stores: Mosaic cannot store scalars to VMEM
    @pl.when((bi == 0) & (ti == 0))
    def _init_loss():
        loss_ref[...] = jnp.zeros((1, 1), jnp.float32)

    loss_ref[...] = loss_ref[...] + tile_loss

    # lowest-index argmax (jnp.argmax tie semantics)
    is_max = z >= m
    pred_ref[0] = jnp.min(jnp.where(is_max, iota_c, c), axis=1)


def _bwd_kernel(logits_ref, labels_ref, sw_ref, cw_ref, rh_ref, rw_ref,
                g_ref, dlr_ref, *, c: int):
    ti = pl.program_id(1)
    rh, rw = rh_ref[...], rw_ref[...]
    z = _upsample_tile(logits_ref[0], rh, rw, c)
    th, _, wo = z.shape
    labels = labels_ref[0]
    sw = sw_ref[0]

    m = jnp.max(z, axis=1, keepdims=True)
    e = jnp.exp(z - m)
    p = e / jnp.sum(e, axis=1, keepdims=True)  # softmax (TH, C, W)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (th, c, wo), 1)
    t_oh = labels[:, None, :] == iota_c
    w_px, _ = _pixel_weight(labels, t_oh, cw_ref, sw, c)
    g = g_ref[...][0, 0]  # full-block load, then index the value
    coeff = (p - t_oh.astype(jnp.float32)) * (w_px * g)[:, None, :]
    # transpose-resize back to low-res: contract W then TH
    d_a = jax.lax.dot_general(
        coeff, rw, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TH, C, w)
    d_lr = jax.lax.dot_general(
        rh, d_a, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (h, C, w)
    d_lr = jnp.transpose(d_lr, (0, 2, 1))  # (h, w, C)

    @pl.when(ti == 0)
    def _init():
        dlr_ref[0] = jnp.zeros_like(dlr_ref[0])

    dlr_ref[0] += d_lr


def _common_specs(b, h, w, c, th, wo, n_tiles):
    return [
        # low-res logits: resident across the batch item's row tiles
        pl.BlockSpec((1, h, w, c), lambda i, t: (i, 0, 0, 0)),
        pl.BlockSpec((1, th, wo), lambda i, t: (i, t, 0)),  # labels
        pl.BlockSpec((1, th, wo), lambda i, t: (i, t, 0)),  # sample w
        pl.BlockSpec((1, c), lambda i, t: (0, 0)),  # class w
        pl.BlockSpec((th, h), lambda i, t: (t, 0)),  # R_h row tile
        pl.BlockSpec((wo, w), lambda i, t: (0, 0)),  # R_w
    ]


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused(logits_lr, labels, sw, cw, out_hw, tile_h, interpret):
    out, _ = _fused_fwd(logits_lr, labels, sw, cw, out_hw, tile_h, interpret)
    return out


def _fused_fwd(logits_lr, labels, sw, cw, out_hw, tile_h, interpret):
    b, h, w, c = logits_lr.shape
    ho, wo = out_hw
    th = tile_h
    n_tiles = ho // th
    rh = jnp.asarray(interp_matrix(ho, h))
    rw = jnp.asarray(interp_matrix(wo, w))
    loss, preds = pl.pallas_call(
        partial(_fwd_kernel, c=c),
        grid=(b, n_tiles),
        in_specs=_common_specs(b, h, w, c, th, wo, n_tiles),
        out_specs=[
            pl.BlockSpec((1, 1), lambda i, t: (0, 0)),
            pl.BlockSpec((1, th, wo), lambda i, t: (i, t, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, ho, wo), jnp.int32),
        ],
        interpret=interpret,
    )(logits_lr, labels, sw, cw, rh, rw)
    return (loss[0, 0], preds), (logits_lr, labels, sw, cw)


def _fused_bwd(out_hw, tile_h, interpret, res, cts):
    logits_lr, labels, sw, cw = res
    g_loss, _g_preds = cts  # preds output is a metric, not differentiated
    b, h, w, c = logits_lr.shape
    ho, wo = out_hw
    th = tile_h
    g = jnp.asarray(g_loss, jnp.float32).reshape(1, 1)
    rh = jnp.asarray(interp_matrix(ho, h))
    rw = jnp.asarray(interp_matrix(wo, w))
    d_lr = pl.pallas_call(
        partial(_bwd_kernel, c=c),
        grid=(b, ho // th),
        in_specs=_common_specs(b, h, w, c, th, wo, ho // th)
        + [pl.BlockSpec((1, 1), lambda i, t: (0, 0))],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i, t: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.float32),
        interpret=interpret,
    )(logits_lr, labels, sw, cw, rh, rw, g)
    return (
        d_lr.astype(logits_lr.dtype),
        np.zeros(labels.shape, jax.dtypes.float0),
        jnp.zeros_like(sw),
        jnp.zeros_like(cw),
    )


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_upsample_ce(
    logits_lr: jax.Array,  # (B, h, w, C) logits at feature resolution
    labels: jax.Array,  # (B, H, W) int
    out_hw: tuple[int, int],
    sample_weights: Optional[jax.Array] = None,  # (B, H, W) f32
    class_weights: Optional[jax.Array] = None,  # (C,) f32
    tile_h: Optional[int] = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused loss tail. Returns (loss_sum, preds):

    loss_sum: scalar SUM over pixels of CE(resize_bilinear(logits_lr,
        out_hw)) * class_weight[label] * sample_weight, ignore/out-of-
        range labels contributing 0 — divide by labels.size for
        losses.reduce_loss's mean.
    preds: (B, H, W) int32 argmax of the upsampled logits (lowest index
        on ties, like jnp.argmax) — feed metrics.jaccard_from_preds for
        the train metric.
    """
    b, h, w, c = logits_lr.shape
    ho, wo = out_hw
    if ho % h or wo % w or (ho, wo) == (h, w):
        raise ValueError(
            f"fused loss expects an integer upsample, got {h, w}->{ho, wo}"
        )
    if sample_weights is None:
        sample_weights = jnp.ones((b, ho, wo), jnp.float32)
    if class_weights is None:
        class_weights = jnp.ones((c,), jnp.float32)
    th = tile_h or _pick_tile(ho)
    return _fused(
        logits_lr.astype(jnp.float32),
        labels.astype(jnp.int32),
        sample_weights.astype(jnp.float32),
        jnp.asarray(class_weights, jnp.float32).reshape(1, c),
        (ho, wo),
        th,
        interpret,
    )


def upsample_ce_reference(
    logits_lr, labels, out_hw, sample_weights=None, class_weights=None
):
    """XLA oracle with identical semantics (resize + losses.py CE +
    argmax preds) — the path the kernel replaces."""
    from deeplabv3p_tpu import losses as losses_lib
    from deeplabv3p_tpu.ops.resize import resize_bilinear

    logits = resize_bilinear(logits_lr.astype(jnp.float32), out_hw)
    if class_weights is not None:
        per_px = losses_lib.weighted_sparse_categorical_crossentropy(
            labels, logits, class_weights
        )
    else:
        per_px = losses_lib.sparse_categorical_crossentropy(labels, logits)
    if sample_weights is not None:
        per_px = per_px * sample_weights
    loss_sum = jnp.sum(per_px)
    preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return loss_sum, preds
