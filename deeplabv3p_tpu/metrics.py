"""Segmentation metrics, fully on-device.

Two families, both ported from the reference with identical math:

* the per-batch streaming `jaccard` training metric
  (/root/reference/deeplabv3p/metrics.py:30-45) — note its quirks are
  preserved: it iterates classes 0..num_classes (inclusive, so one class
  index beyond the logits), only averages over batch elements where the
  class appears in ground truth, and drops NaN class entries;
* the confusion-matrix evaluation suite
  (/root/reference/eval.py:368-506): bincount-trick matrix accumulation and
  PixelAcc / mClassAcc / IoU / mIoU / FWIoU / Dice derivation.

The confusion matrix is computed on device (one-hot matmul free: bincount
of num_classes * gt + pred) and accumulated in a streaming fashion across
eval batches; only the final (C, C) matrix ever reaches the host.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def jaccard(y_true: jax.Array, y_pred_logits: jax.Array) -> jax.Array:
    """Streaming mean-IOU training metric (reference metrics.py:30-45).

    y_true: (N, ...) integer labels; y_pred_logits: (N, ..., C).
    Flattens spatial dims; for each class i in 0..C (inclusive — the
    reference's off-by-one is intentional behaviourally): per-sample
    IoU, averaged over samples whose GT contains the class, then averaged
    over classes that produced a non-NaN value.
    """
    return jaccard_from_preds(
        y_true, jnp.argmax(y_pred_logits, axis=-1),
        y_pred_logits.shape[-1],
    )


def jaccard_from_preds(
    y_true: jax.Array, preds: jax.Array, num_classes: int
) -> jax.Array:
    """jaccard from precomputed argmax predictions — the entry point for
    producers that already hold int preds (e.g. the fused upsample+CE
    Pallas kernel, ops/pallas/upsample_ce.py, whose argmax ties break
    lowest-index like jnp.argmax)."""
    n = y_true.shape[0]
    labels = y_true.reshape(n, -1).astype(jnp.int32)
    preds = preds.reshape(n, -1).astype(jnp.int32)

    # One per-sample confusion matrix via batched one-hot matmul (MXU)
    # instead of a python loop of per-class masked reductions — the loop
    # form re-reads the full-resolution label/pred tensors C+1 times and
    # dominated the mnv2-lite train step (measured r3). GT one-hots over
    # C+2 bins: 0..C-1 real classes, bin C = the LITERAL value C (the
    # reference's 0..C-INCLUSIVE class loop treats it as a real class:
    # legal when present, IOU 0 since preds never reach C), bin C+1 =
    # everything else out of range (ignore 255) — excluded from GT
    # counts but still contributing to predicted-pixel counts, exactly
    # like the reference's unmasked `preds == i` over ALL pixels.
    ncls = num_classes
    gt_bins = jnp.where((labels >= 0) & (labels <= ncls), labels, ncls + 1)
    oh_gt = jax.nn.one_hot(gt_bins, ncls + 2, dtype=jnp.float32)
    oh_pred = jax.nn.one_hot(preds, ncls, dtype=jnp.float32)
    cm = jnp.einsum(
        "bnc,bnd->bcd", oh_gt, oh_pred,
        preferred_element_type=jnp.float32,
    )  # (B, C+2, C): rows = GT bins, cols = predicted class
    return jaccard_from_sample_cm(cm)


def jaccard_from_sample_cm(cm: jax.Array) -> jax.Array:
    """jaccard's reduction from per-sample (C+2, C) confusion matrices
    (rows: GT classes 0..C-1, literal C, other-out-of-range; cols:
    predicted class) as produced by the einsum above."""
    n = cm.shape[0]
    ncls = cm.shape[-1]
    zero = jnp.zeros((n, 1), jnp.float32)
    inter = jnp.concatenate(
        [jnp.diagonal(cm[:, :ncls, :], axis1=1, axis2=2), zero], axis=1
    )  # (B, C+1); class C can never be predicted
    t_count = cm[:, : ncls + 1, :].sum(axis=2)  # (B, C+1) GT pixels
    p_count = jnp.concatenate([cm.sum(axis=1), zero], axis=1)  # (B, C+1)
    union = t_count + p_count - inter
    legal = t_count > 0  # class present in GT for this sample
    ious = jnp.where(legal, jnp.where(union > 0, inter / union, 0.0), 0.0)
    cnt = legal.astype(jnp.float32).sum(axis=0)  # per class over batch
    class_mean = jnp.where(cnt > 0, ious.sum(axis=0) / cnt, jnp.nan)
    valid = ~jnp.isnan(class_mean)
    return jnp.sum(jnp.where(valid, class_mean, 0.0)) / jnp.sum(
        valid.astype(jnp.float32)
    )


def confusion_matrix(
    gt_mask: jax.Array, pred_mask: jax.Array, num_classes: int
) -> jax.Array:
    """Per-batch confusion matrix via the bincount trick
    (reference generate_matrix, eval.py:368-373). Labels outside
    [0, num_classes) — e.g. ignore_index 255 — are excluded."""
    gt = gt_mask.reshape(-1).astype(jnp.int32)
    pred = pred_mask.reshape(-1).astype(jnp.int32)
    valid = (gt >= 0) & (gt < num_classes)
    idx = num_classes * gt + pred
    idx = jnp.where(valid, idx, num_classes * num_classes)  # spill bucket
    counts = jnp.bincount(idx, length=num_classes * num_classes + 1)
    return counts[:-1].reshape(num_classes, num_classes)


def confusion_matrix_matmul(
    gt_mask: jax.Array, pred_mask: jax.Array, num_classes: int
) -> jax.Array:
    """Confusion matrix as ONE-HOT MATMUL: cmᵢⱼ = Σₙ 1[gt=i]·1[pred=j],
    i.e. (C, N) @ (N, C) — MXU-shaped, no scatter. The bincount form
    lowers to a serialized scatter-add on TPU; this form rides the
    systolic array instead (the 'fully-fused eval' formulation, VERDICT
    r2 item #6). f32 accumulation is exact below 2²⁴ counts per cell —
    a 512² batch of 8 images is 2.1 M pixels, well under.

    Same contract as `confusion_matrix`: gt outside [0, num_classes)
    (ignore_index 255) is excluded.
    """
    gt = gt_mask.reshape(-1).astype(jnp.int32)
    pred = pred_mask.reshape(-1).astype(jnp.int32)
    valid = (gt >= 0) & (gt < num_classes)
    oh_gt = jax.nn.one_hot(
        jnp.where(valid, gt, num_classes), num_classes, dtype=jnp.float32
    )  # invalid rows one-hot to the dropped C-th slot → all-zero row
    oh_pred = jax.nn.one_hot(pred, num_classes, dtype=jnp.float32)
    cm = jnp.einsum(
        "nc,nd->cd", oh_gt, oh_pred,
        preferred_element_type=jnp.float32,
    )
    return cm.astype(jnp.int32)


class SegmentMetrics(NamedTuple):
    pixel_acc: float
    mean_class_acc: float
    miou: float
    fwiou: float
    class_acc: np.ndarray
    iou: np.ndarray
    dice: np.ndarray
    freq: np.ndarray
    confusion: np.ndarray = None  # the (C, C) source matrix


def segment_metrics_from_confusion(cm: np.ndarray) -> SegmentMetrics:
    """Derive the eval metric suite from a confusion matrix, matching
    reference eval.py:461-506 (including its NaN→0 handling and the fact
    that mIoU is the plain mean over all classes after NaN→0)."""
    cm = np.asarray(cm, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        pixel_acc = np.diag(cm).sum() / cm.sum()

        class_acc = np.diag(cm) / cm.sum(axis=1)
        class_acc[np.isnan(class_acc)] = 0
        mean_class_acc = np.nanmean(class_acc)

        inter = np.diag(cm)
        union = cm.sum(axis=0) + cm.sum(axis=1) - inter
        iou = inter / union
        iou[np.isnan(iou)] = 0

        freq = cm.sum(axis=1) / cm.sum()
        freq[np.isnan(freq)] = 0
        fwiou = (freq[freq > 0] * iou[freq > 0]).sum()

        dice = 2 * inter / (union + inter)
        dice[np.isnan(dice)] = 0

        miou = np.nanmean(iou)

    return SegmentMetrics(
        pixel_acc=float(pixel_acc),
        mean_class_acc=float(mean_class_acc),
        miou=float(miou),
        fwiou=float(fwiou),
        class_acc=class_acc,
        iou=iou,
        dice=dice,
        freq=freq,
        confusion=np.asarray(cm),
    )


def mIOU_numpy(gt: np.ndarray, preds: np.ndarray) -> float:
    """Single-pair mIOU over the labels present in gt
    (reference metrics.py:10-17)."""
    ulabels = np.unique(gt)
    iou = np.zeros(len(ulabels))
    for k, u in enumerate(ulabels):
        inter = ((gt == u) & (preds == u)).sum()
        union = ((gt == u) | (preds == u)).sum()
        iou[k] = inter / union
    return float(np.round(iou.mean(), 2))
