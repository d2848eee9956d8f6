"""Metric parity tests against numpy implementations of the reference
formulas (/root/reference/deeplabv3p/metrics.py, /root/reference/eval.py)."""

import jax.numpy as jnp
import numpy as np

from deeplabv3p_tpu import metrics

RNG = np.random.RandomState(42)


def test_confusion_matrix_matches_bincount_trick():
    num_classes = 6
    gt = RNG.randint(0, num_classes, size=(2, 31, 33))
    gt[0, :4, :4] = 255  # ignore region
    pred = RNG.randint(0, num_classes, size=(2, 31, 33))

    got = np.asarray(metrics.confusion_matrix(jnp.asarray(gt), jnp.asarray(pred), num_classes))

    # reference generate_matrix (eval.py:368-373)
    valid = (gt >= 0) & (gt < num_classes)
    label = num_classes * gt[valid].astype(int) + pred[valid]
    expected = np.bincount(label, minlength=num_classes**2).reshape(
        num_classes, num_classes
    )
    np.testing.assert_array_equal(got, expected)


def test_segment_metrics_simple():
    # 2-class perfect prediction
    cm = np.array([[10, 0], [0, 5]], dtype=float)
    m = metrics.segment_metrics_from_confusion(cm)
    assert m.pixel_acc == 1.0
    assert m.miou == 1.0
    assert m.fwiou == 1.0
    assert m.mean_class_acc == 1.0


def test_segment_metrics_match_reference_formulas():
    num_classes = 5
    cm = RNG.randint(0, 50, size=(num_classes, num_classes)).astype(float)
    cm[3] = 0  # absent class → NaN handling path
    m = metrics.segment_metrics_from_confusion(cm)

    # reference eval.py:461-506
    PixelAcc = np.diag(cm).sum() / cm.sum()
    with np.errstate(divide="ignore", invalid="ignore"):
        ClassAcc = np.diag(cm) / cm.sum(axis=1)
    ClassAcc[np.isnan(ClassAcc)] = 0
    I = np.diag(cm)
    U = cm.sum(axis=0) + cm.sum(axis=1) - I
    with np.errstate(divide="ignore", invalid="ignore"):
        IoU = I / U
    IoU[np.isnan(IoU)] = 0
    Freq = cm.sum(axis=1) / cm.sum()
    FWIoU = (Freq[Freq > 0] * IoU[Freq > 0]).sum()

    np.testing.assert_allclose(m.pixel_acc, PixelAcc)
    np.testing.assert_allclose(m.class_acc, ClassAcc)
    np.testing.assert_allclose(m.iou, IoU)
    np.testing.assert_allclose(m.fwiou, FWIoU)
    np.testing.assert_allclose(m.miou, np.nanmean(IoU))
    np.testing.assert_allclose(m.mean_class_acc, np.nanmean(ClassAcc))


def test_jaccard_perfect_prediction():
    num_classes = 4
    labels = RNG.randint(0, num_classes, size=(2, 64))
    logits = np.full((2, 64, num_classes), -10.0, np.float32)
    for n in range(2):
        logits[n, np.arange(64), labels[n]] = 10.0
    j = float(metrics.jaccard(jnp.asarray(labels), jnp.asarray(logits)))
    assert abs(j - 1.0) < 1e-6


def test_jaccard_matches_reference_semantics():
    """Replicates reference Jaccard (metrics.py:30-45) in numpy, including
    the 0..num_classes inclusive loop, legal-batch masking, NaN drops."""
    num_classes = 3
    labels = RNG.randint(0, num_classes + 1, size=(4, 50))  # includes class 3
    logits = RNG.randn(4, 50, num_classes).astype(np.float32)

    preds = np.argmax(logits, axis=-1)
    iou = []
    for i in range(num_classes + 1):
        t = labels == i
        p = preds == i
        inter = (t & p).sum(axis=1)
        union = (t | p).sum(axis=1)
        legal = t.sum(axis=1) > 0
        with np.errstate(divide="ignore", invalid="ignore"):
            ious = inter / union
        sel = ious[legal]
        iou.append(np.mean(sel) if len(sel) else np.nan)
    iou = np.array(iou)
    expected = np.mean(iou[~np.isnan(iou)])

    got = float(metrics.jaccard(jnp.asarray(labels), jnp.asarray(logits)))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_miou_numpy():
    gt = np.array([[0, 0], [1, 1]])
    pred = np.array([[0, 1], [1, 1]])
    # class 0: inter 1, union 2 -> 0.5 ; class 1: inter 2, union 3 -> .667
    assert metrics.mIOU_numpy(gt, pred) == np.round((0.5 + 2 / 3) / 2, 2)
