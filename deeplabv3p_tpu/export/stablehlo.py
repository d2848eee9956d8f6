"""StableHLO export — the TPU-native analogue of the reference's
h5→pb/TFLite converters (tools/model_converter/keras_to_tensorflow.py,
keras_to_tflite.py).

`export_model` captures the full inference program (normalize → forward →
softmax, weights baked in as constants) as a serialized, versioned
StableHLO artifact that any PJRT runtime can execute — the deployment
artifact consumed by the C++ inference CLI and by serving.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_model(
    model,
    variables,
    input_shape: tuple[int, int],
    batch_size: int = 1,
    with_softmax: bool = True,
    with_argmax: bool = False,
) -> "jax_export.Exported":
    """Export the inference program to a portable StableHLO artifact.

    The exported signature takes normalized images (B, H, W, 3) f32 and
    returns softmax probabilities (reference dump_model semantics,
    /root/reference/deeplab.py:112-120: inference graph ends at the
    `pred_mask` Softmax) or, with `with_argmax`, the int32 mask directly
    (the reference documents that fused-argmax variant at model.py:82-90).
    """

    def infer(images):
        logits = model.apply(variables, images, train=False)
        if with_argmax:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if with_softmax:
            return jax.nn.softmax(logits, axis=-1)
        return logits

    x_spec = jax.ShapeDtypeStruct(
        (batch_size, *input_shape, 3), jnp.float32
    )
    return jax_export.export(jax.jit(infer))(x_spec)


def save_exported(exported: "jax_export.Exported", path: str) -> None:
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_exported(path: str) -> Callable:
    """Load a serialized artifact; returns a callable running under jit."""
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return exported.call
