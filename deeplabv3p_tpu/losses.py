"""Segmentation losses with ignore-index support, matching the reference
(/root/reference/deeplabv3p/loss.py) numerically.

Differences by design (TPU-first):

* Models here emit **logits**; the stable `from_logits=True` path
  (log-softmax) is the default. The reference's in-graph Softmax +
  probability clipping path (loss.py:52,106) is reproduced exactly when
  `from_logits=False` for parity testing against TF model outputs.
* Labels are dense (N, H, W) int arrays — no (H*W, 1) flatten
  (reference model.py:79-80); the math is identical.
* L2 regularization of conv kernels/biases, which Keras attaches per-layer
  via kernel_regularizer (reference layers.py:14-41, L2_FACTOR=2e-5), is a
  single `l2_penalty` term added to the training loss.

All reductions follow Keras fit() semantics: per-pixel losses are averaged
over every pixel (ignored pixels contribute 0 to the numerator but still
count in the denominator), and sample weights multiply per-pixel losses
before the mean — reference train.py:157 uses
`sample_weight_mode='temporal'` with per-pixel weight maps (data.py:134-152).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

_PROB_CLIP = 1e-15  # reference loss.py:52,106


def _prep(
    y_true: jax.Array, y_pred: jax.Array, from_logits: bool
) -> tuple[jax.Array, jax.Array]:
    """Return (one_hot_targets, log_probs). Out-of-range labels (e.g. the
    255 ignore index) one-hot to all-zero rows, so they contribute zero loss
    even before masking — same as K.one_hot on out-of-range indices."""
    num_classes = y_pred.shape[-1]
    one_hot = jax.nn.one_hot(y_true, num_classes, dtype=jnp.float32)
    y_pred = y_pred.astype(jnp.float32)
    if from_logits:
        log_probs = jax.nn.log_softmax(y_pred, axis=-1)
    else:
        probs = jnp.clip(y_pred, _PROB_CLIP, 1.0 - _PROB_CLIP)
        log_probs = jnp.log(probs)
    return one_hot, log_probs


def _ignore_mask(
    y_true: jax.Array, ignore_index: Optional[int]
) -> Optional[jax.Array]:
    if ignore_index is None:
        return None
    return (y_true != ignore_index).astype(jnp.float32)


def sparse_categorical_crossentropy(
    y_true: jax.Array,
    y_pred: jax.Array,
    ignore_index: Optional[int] = 255,
    from_logits: bool = True,
) -> jax.Array:
    """Per-pixel CE with ignore mask (reference SparseCategoricalCrossEntropy,
    loss.py:121-156). Returns losses with y_true's shape."""
    one_hot, log_probs = _prep(y_true, y_pred, from_logits)
    losses = -jnp.sum(one_hot * log_probs, axis=-1)
    mask = _ignore_mask(y_true, ignore_index)
    if mask is not None:
        losses = losses * mask
    return losses


def weighted_sparse_categorical_crossentropy(
    y_true: jax.Array,
    y_pred: jax.Array,
    class_weights: jax.Array,
    ignore_index: Optional[int] = 255,
    from_logits: bool = True,
) -> jax.Array:
    """Static per-class weighted CE (reference
    WeightedSparseCategoricalCrossEntropy, loss.py:159-191)."""
    one_hot, log_probs = _prep(y_true, y_pred, from_logits)
    losses = -jnp.sum(one_hot * log_probs, axis=-1)
    weights = jnp.sum(jnp.asarray(class_weights, jnp.float32) * one_hot, axis=-1)
    losses = losses * weights
    mask = _ignore_mask(y_true, ignore_index)
    if mask is not None:
        losses = losses * mask
    return losses


def sparse_softmax_focal_loss(
    y_true: jax.Array,
    y_pred: jax.Array,
    gamma: float = 2.0,
    alpha: float = 0.25,
    ignore_index: Optional[int] = 255,
    from_logits: bool = True,
) -> jax.Array:
    """Softmax focal loss (reference SparseSoftmaxFocalLoss, loss.py:63-118):
    sum_c alpha * (1 - p_c)^gamma * (-t_c log p_c), probability clipped to
    [1e-15, 1-1e-15] as in loss.py:106."""
    num_classes = y_pred.shape[-1]
    one_hot = jax.nn.one_hot(y_true, num_classes, dtype=jnp.float32)
    y_pred = y_pred.astype(jnp.float32)
    probs = jax.nn.softmax(y_pred, axis=-1) if from_logits else y_pred
    probs = jnp.clip(probs, _PROB_CLIP, 1.0 - _PROB_CLIP)
    cross_entropy = -one_hot * jnp.log(probs)
    losses = jnp.sum(alpha * jnp.power(1.0 - probs, gamma) * cross_entropy, axis=-1)
    mask = _ignore_mask(y_true, ignore_index)
    if mask is not None:
        losses = losses * mask
    return losses


def reduce_loss(
    losses: jax.Array, sample_weights: Optional[jax.Array] = None
) -> jax.Array:
    """Keras-style reduction: mean over all pixels; sample weights (the
    per-pixel adaptive class-weight map, data.py:134-152) multiply first."""
    if sample_weights is not None:
        losses = losses * sample_weights
    return jnp.mean(losses)


def l2_penalty(params: Any, factor: float = 2e-5) -> jax.Array:
    """Sum of L2 penalties over conv kernels & conv biases.

    Matches the reference's per-layer kernel/bias regularizers, which are
    attached only to the Deeplab*Conv2D wrappers (layers.py:14-41): conv
    kernels are 4-D, so 2-D/3-D Dense kernels (MobileViT transformer FF
    and MHA projections — plain Keras layers with no regularizer in the
    reference) and BN/LN scale/bias are excluded. A conv `bias` is
    identified by its 4-D `kernel` sibling.
    """
    total = 0.0
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    # collect scopes whose kernel is convolutional (4-D)
    conv_scopes = {
        tuple(getattr(p, "key", str(p)) for p in path[:-1])
        for path, leaf in flat
        if getattr(path[-1], "key", None) == "kernel" and leaf.ndim == 4
    }
    for path, leaf in flat:
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        if keys[:-1] not in conv_scopes:
            continue
        if keys[-1] in ("kernel", "bias"):
            total = total + jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    return factor * total


LOSS_REGISTRY = {
    "crossentropy": sparse_categorical_crossentropy,
    "focal": sparse_softmax_focal_loss,
}


def get_loss_fn(
    loss_type: str,
    weighted_type: Optional[str] = None,
    class_weights: Optional[jax.Array] = None,
    ignore_index: Optional[int] = 255,
    from_logits: bool = True,
):
    """Loss selection mirroring reference train.py:108-137:

    * loss_type 'focal' → focal loss (ignores weighted_type, as the
      reference warns focal is incompatible with class weighting);
    * weighted_type 'balanced' → static class-weighted CE (needs weights);
    * weighted_type 'adaptive' → plain CE; the per-image weight map is fed
      through `sample_weights` in `reduce_loss`;
    * otherwise plain CE.
    """
    if loss_type == "focal":
        return lambda y_true, y_pred, **kw: sparse_softmax_focal_loss(
            y_true, y_pred, ignore_index=ignore_index, from_logits=from_logits
        )
    if weighted_type == "balanced":
        if class_weights is None:
            raise ValueError("balanced weighting requires class_weights")
        return lambda y_true, y_pred, **kw: weighted_sparse_categorical_crossentropy(
            y_true, y_pred, class_weights,
            ignore_index=ignore_index, from_logits=from_logits,
        )
    return lambda y_true, y_pred, **kw: sparse_categorical_crossentropy(
        y_true, y_pred, ignore_index=ignore_index, from_logits=from_logits
    )
