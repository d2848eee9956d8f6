"""Fused argmax + confusion-matrix Pallas kernel.

The eval hot loop (reference eval.py:403-459 per-image; our streaming
eval) needs `confusion_matrix(labels, argmax(logits))`. Composed in XLA
that is: materialize the (B, H, W) argmax array, form C*gt+pred, then
`bincount` — which lowers to a serialized scatter-add over B*H*W elements
on TPU.

This kernel consumes logits tiles straight out of VMEM: per tile it
computes the class argmax, joins with labels into joint-bin indices, and
accumulates the (C*C)-bin histogram with a vectorized bin-compare
reduction (TILE x BINS one-hot sum — pure VPU work, no scatter). The
(1, BINS) accumulator output block is revisited by every grid step, which
is well-defined on TPU's sequential grid.

`confusion_matrix_fused` falls back to interpreter mode off-TPU so tests
cover the kernel on the CPU mesh.

Measured on TPU v5e (16x512x512x21): 39.6 ms fused vs 38.6 ms for XLA's
argmax+bincount — parity, not a win; per-call dispatch overhead dominates
both at this size. Kept as the foundation for the fully-fused eval step
(logits never leave VMEM) and exercised by tests, but not wired into the
default eval path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_TILE = 1024  # pixels per grid step (8 sublanes x 128 lanes)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(labels_ref, logits_ref, out_ref, *, num_classes: int, bins: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    logits = logits_ref[...]  # (TILE, C)
    gt = labels_ref[...][:, 0]  # (TILE,)
    # first-index tie-break to match XLA argmax exactly (Mosaic's argmax
    # may pick a different winner on exact float ties)
    row_max = jnp.max(logits, axis=-1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    pred = jnp.min(
        jnp.where(logits == row_max, col, logits.shape[-1]), axis=-1
    ).astype(jnp.int32)
    valid = (gt >= 0) & (gt < num_classes)
    # invalid labels (ignore_index / padding) spill into the last padded
    # bin, which the wrapper drops
    idx = jnp.where(valid, gt * num_classes + pred, bins - 1)
    bin_ids = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], bins), 1)
    onehot = (idx[:, None] == bin_ids).astype(jnp.int32)
    out_ref[...] += jnp.sum(onehot, axis=0)[None, :]


@partial(jax.jit, static_argnames=("num_classes", "interpret"))
def confusion_matrix_fused(
    labels: jax.Array,
    logits: jax.Array,
    num_classes: int,
    interpret: bool = False,
) -> jax.Array:
    """Confusion matrix (C, C) from labels (...,) and logits (..., C).

    Semantics match deeplabv3p_tpu.metrics.confusion_matrix applied to
    argmax(logits): rows = GT, cols = prediction, labels outside
    [0, num_classes) excluded.
    """
    c = logits.shape[-1]
    flat_logits = logits.reshape(-1, c).astype(jnp.float32)
    flat_labels = labels.reshape(-1).astype(jnp.int32)
    n = flat_labels.shape[0]

    n_pad = _round_up(max(n, _TILE), _TILE)
    # pad the class dim to full lanes with -inf: a ragged last dimension
    # would leave uninitialized lanes in the VMEM block and corrupt the
    # argmax
    c_pad = _round_up(c, 128)
    bins = _round_up(num_classes * num_classes + 1, 128)

    flat_logits = jnp.pad(
        flat_logits, ((0, n_pad - n), (0, c_pad - c)),
        constant_values=-jnp.inf,
    )
    if n_pad != n:
        flat_labels = jnp.pad(
            flat_labels, (0, n_pad - n), constant_values=-1
        )

    grid = (n_pad // _TILE,)
    out = pl.pallas_call(
        partial(_kernel, num_classes=num_classes, bins=bins),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE, 1), lambda i: (i, 0)),
            pl.BlockSpec((_TILE, c_pad), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((1, bins), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, bins), jnp.int32),
        interpret=interpret,
    )(flat_labels[:, None], flat_logits)
    return out[0, : num_classes * num_classes].reshape(num_classes, num_classes)


def confusion_matrix_from_logits(
    labels: jax.Array, logits: jax.Array, num_classes: int
) -> jax.Array:
    """Dispatch: Pallas kernel on TPU, interpreter elsewhere."""
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    return confusion_matrix_fused(
        labels, logits, num_classes, interpret=not on_tpu
    )
