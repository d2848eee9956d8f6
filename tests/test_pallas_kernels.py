"""Pallas kernel correctness tests (interpreter mode on the CPU mesh)."""

import jax.numpy as jnp
import numpy as np

from deeplabv3p_tpu import metrics
from deeplabv3p_tpu.ops.pallas.confusion import confusion_matrix_fused

RNG = np.random.RandomState(3)


def test_fused_confusion_matches_reference():
    num_classes = 6
    labels = RNG.randint(0, num_classes, size=(2, 37, 41)).astype(np.int32)
    labels[0, :5, :5] = 255  # ignore region
    logits = RNG.randn(2, 37, 41, num_classes).astype(np.float32)

    fused = np.asarray(
        confusion_matrix_fused(
            jnp.asarray(labels), jnp.asarray(logits), num_classes,
            interpret=True,
        )
    )
    preds = np.argmax(logits, axis=-1)
    expected = np.asarray(
        metrics.confusion_matrix(jnp.asarray(labels), jnp.asarray(preds), num_classes)
    )
    np.testing.assert_array_equal(fused, expected)


def test_fused_confusion_large_and_padded():
    """Non-multiple-of-tile sizes exercise the padding path."""
    num_classes = 21
    n = 1024 * 3 + 77
    labels = RNG.randint(0, 30, size=(n,)).astype(np.int32)  # some invalid
    logits = RNG.randn(n, num_classes).astype(np.float32)

    fused = np.asarray(
        confusion_matrix_fused(
            jnp.asarray(labels), jnp.asarray(logits), num_classes,
            interpret=True,
        )
    )
    preds = np.argmax(logits, axis=-1)
    valid = labels < num_classes
    idx = num_classes * labels[valid] + preds[valid]
    expected = np.bincount(idx, minlength=num_classes**2).reshape(
        num_classes, num_classes
    )
    np.testing.assert_array_equal(fused, expected)
    assert fused.sum() == valid.sum()
