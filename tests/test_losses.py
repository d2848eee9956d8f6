"""Loss parity tests against numpy implementations of the reference
formulas (/root/reference/deeplabv3p/loss.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplabv3p_tpu import losses

RNG = np.random.RandomState(0)
N, P, C = 2, 17, 5
IGNORE = 255


def _softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


@pytest.fixture
def data():
    logits = RNG.randn(N, P, C).astype(np.float32)
    labels = RNG.randint(0, C, size=(N, P)).astype(np.int32)
    labels[0, :3] = IGNORE  # some ignored pixels
    return labels, logits


def ref_ce(labels, probs, ignore_index):
    """Reference SparseCategoricalCrossEntropy (loss.py:135-156):
    K.categorical_crossentropy on probs with out-of-range one-hot = 0."""
    one_hot = np.zeros_like(probs)
    for n in range(N):
        for p in range(P):
            if labels[n, p] < C:
                one_hot[n, p, labels[n, p]] = 1
    # Keras normalizes probs along axis then clips to [eps, 1-eps], eps=1e-7
    pr = probs / probs.sum(-1, keepdims=True)
    pr = np.clip(pr, 1e-7, 1 - 1e-7)
    ce = -(one_hot * np.log(pr)).sum(-1)
    mask = (labels != ignore_index).astype(np.float32)
    return ce * mask


def ref_focal(labels, probs, gamma, alpha, ignore_index):
    """Reference SparseSoftmaxFocalLoss (loss.py:89-118)."""
    one_hot = np.zeros_like(probs)
    for n in range(N):
        for p in range(P):
            if labels[n, p] < C:
                one_hot[n, p, labels[n, p]] = 1
    pr = np.clip(probs, 1e-15, 1 - 1e-15)
    ce = -one_hot * np.log(pr)
    losses_ = (alpha * (1 - pr) ** gamma * ce).sum(-1)
    mask = (labels != ignore_index).astype(np.float32)
    return losses_ * mask


def test_ce_matches_reference(data):
    labels, logits = data
    probs = _softmax(logits)
    expected = ref_ce(labels, probs, IGNORE)
    got = losses.sparse_categorical_crossentropy(
        jnp.asarray(labels), jnp.asarray(logits), ignore_index=IGNORE,
        from_logits=True,
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-5)


def test_ce_from_probs(data):
    labels, logits = data
    probs = _softmax(logits)
    got = losses.sparse_categorical_crossentropy(
        jnp.asarray(labels), jnp.asarray(probs), ignore_index=IGNORE,
        from_logits=False,
    )
    expected = ref_ce(labels, probs, IGNORE)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-5)


def test_focal_matches_reference(data):
    labels, logits = data
    probs = _softmax(logits)
    expected = ref_focal(labels, probs, 2.0, 0.25, IGNORE)
    got = losses.sparse_softmax_focal_loss(
        jnp.asarray(labels), jnp.asarray(logits), ignore_index=IGNORE,
        from_logits=True,
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-5)


def test_weighted_ce(data):
    labels, logits = data
    weights = RNG.rand(C).astype(np.float32) + 0.5
    got = losses.weighted_sparse_categorical_crossentropy(
        jnp.asarray(labels), jnp.asarray(logits), jnp.asarray(weights),
        ignore_index=IGNORE, from_logits=True,
    )
    probs = _softmax(logits)
    base = ref_ce(labels, probs, IGNORE)
    w = np.where(labels < C, weights[np.minimum(labels, C - 1)], 0.0)
    np.testing.assert_allclose(np.asarray(got), base * w, rtol=1e-4, atol=1e-5)


def test_ignored_pixels_zero_loss(data):
    labels, logits = data
    got = losses.sparse_categorical_crossentropy(
        jnp.asarray(labels), jnp.asarray(logits), ignore_index=IGNORE
    )
    assert np.all(np.asarray(got)[labels == IGNORE] == 0)


def test_reduce_loss_with_sample_weights(data):
    labels, logits = data
    per_pixel = losses.sparse_categorical_crossentropy(
        jnp.asarray(labels), jnp.asarray(logits)
    )
    sw = jnp.asarray(RNG.rand(N, P).astype(np.float32))
    got = losses.reduce_loss(per_pixel, sw)
    np.testing.assert_allclose(
        float(got), float(np.mean(np.asarray(per_pixel) * np.asarray(sw))),
        rtol=1e-6,
    )


def test_l2_penalty_excludes_bn():
    from deeplabv3p_tpu.models.layers import ConvBN

    model = ConvBN(features=4, kernel_size=3, use_bias=True)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))["params"]
    pen = losses.l2_penalty(params, factor=1.0)
    kernel = params["conv"]["kernel"]
    bias = params["conv"]["bias"]
    expected = float(np.sum(np.square(kernel)) + np.sum(np.square(bias)))
    np.testing.assert_allclose(float(pen), expected, rtol=1e-6)
