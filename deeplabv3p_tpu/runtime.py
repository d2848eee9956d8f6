"""Embedded-runtime bridge for the native inference CLI.

The C++ `deeplabSegment` app (inference/deeplabSegment.cpp) owns image IO,
preprocessing fill, timing, argmax post-processing, and PNG output —
the same native responsibilities as the reference's TFLite/MNN apps
(/root/reference/inference/tflite/deeplabSegment.cpp:178-330). Model
execution goes through this module via the CPython C API: the app embeds
the interpreter, constructs a `Runner`, and calls `run_bytes` with the
raw normalized float buffer. XLA executes on whatever backend is
available (TPU via PJRT, else CPU).

Accepted model artifacts:
* `.shlo` — serialized StableHLO from deeplabv3p_tpu.export (weights
  baked in);
* `.ckpt` — flax variables; requires `model_type`, `num_classes`,
  `input_shape` to rebuild the forward program.
"""

from __future__ import annotations

import numpy as np


class Runner:
    def __init__(
        self,
        model_path: str,
        model_type: str = "mobilenetv2_lite",
        num_classes: int = 21,
        input_height: int = 512,
        input_width: int = 512,
    ):
        import os

        import jax

        # allow forcing the backend (e.g. DEEPLAB_TPU_PLATFORM=cpu) — this
        # environment's sitecustomize pins jax_platforms programmatically,
        # so a plain JAX_PLATFORMS env var is not enough.
        platform = os.environ.get("DEEPLAB_TPU_PLATFORM")
        if platform:
            jax.config.update("jax_platforms", platform)

        import jax.numpy as jnp

        self.input_hw = (input_height, input_width)
        self.num_classes = num_classes

        if model_path.endswith(".shlo"):
            from deeplabv3p_tpu.export.stablehlo import load_exported

            self._fn = jax.jit(load_exported(model_path))
        else:
            from deeplabv3p_tpu.models.factory import build_deeplab_model
            from deeplabv3p_tpu.utils.checkpoint import load_variables

            model = build_deeplab_model(
                model_type, num_classes, dtype=jnp.bfloat16
            )
            template = jax.eval_shape(
                model.init, jax.random.PRNGKey(0),
                jnp.zeros((1, *self.input_hw, 3), jnp.float32),
            )
            template = jax.tree_util.tree_map(
                lambda s: np.zeros(s.shape, s.dtype), template
            )
            variables = load_variables(model_path, template)

            def infer(images):
                logits = model.apply(variables, images, train=False)
                return jax.nn.softmax(logits, axis=-1)

            self._fn = jax.jit(infer)

    def run_bytes(self, data: bytes, batch: int, h: int, w: int):
        """data: float32 normalized NHWC image buffer. Returns
        (probs_bytes, out_h, out_w, num_classes)."""
        import jax

        x = np.frombuffer(data, np.float32).reshape(batch, h, w, 3)
        probs = np.asarray(jax.block_until_ready(self._fn(x)))
        return (
            probs.astype(np.float32).tobytes(),
            probs.shape[1],
            probs.shape[2],
            probs.shape[3],
        )
