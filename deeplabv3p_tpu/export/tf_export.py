"""TensorFlow-ecosystem export: real .tflite / SavedModel / frozen .pb.

Rebuilds the reference's TF-format converters on top of jax2tf:

* `export_tflite` — h5/ckpt → .tflite, fp32 (reference
  tools/model_converter/keras_to_tflite.py:14-26), float16, or int8
  post-training quantization with a representative dataset (reference
  post_train_quant_convert.py:20-57: Optimize.DEFAULT + representative
  generator; inputs/outputs stay float, matching the reference's setting).
* `export_saved_model` / `export_frozen_pb` — the reference's
  keras_to_tensorflow.py:82+ frozen-graph role (variables folded to
  constants via convert_variables_to_constants_v2).
* `TFLiteRunner` / `FrozenGraphRunner` — per-sample predictors so
  `eval.py` can score .tflite/.pb artifacts exactly like the reference's
  multi-format evaluator (reference eval.py:33-197).

Everything here imports tensorflow lazily; the core package stays TF-free
and these entry points raise a clear gate error when TF is absent.
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np


def _require_tf():
    try:
        import tensorflow as tf  # noqa: F401

        return tf
    except ImportError as e:  # pragma: no cover - exercised only w/o TF
        raise ImportError(
            "TF-format export requires tensorflow (gated dependency; "
            "use --format shlo/onnx for the TF-free deployment formats)"
        ) from e


def _tf_concrete_fn(model, variables, input_shape, batch_size, *,
                    with_softmax=True, with_argmax=False):
    """jax inference fn → TF ConcreteFunction with a static signature.

    Same program shape as stablehlo.export_model: images (B,H,W,3) f32 →
    softmax probabilities (the reference graph ends at the 'pred_mask'
    Softmax, deeplab.py:112-120) or fused-argmax int32 mask.
    """
    tf = _require_tf()
    import jax
    import jax.numpy as jnp
    from jax.experimental import jax2tf

    def infer(images):
        logits = model.apply(variables, images, train=False)
        if with_argmax:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if with_softmax:
            return jax.nn.softmax(logits, axis=-1)
        return logits

    tf_fn = tf.function(
        jax2tf.convert(infer, with_gradient=False),
        input_signature=[
            tf.TensorSpec((batch_size, *input_shape, 3), tf.float32,
                          name="image_input")
        ],
        autograph=False,
    )
    return tf_fn.get_concrete_function()


def export_tflite(
    model,
    variables,
    input_shape: tuple[int, int],
    batch_size: int = 1,
    *,
    quantize: Optional[str] = None,  # None | 'int8' | 'float16'
    representative_data: Optional[Iterable[np.ndarray]] = None,
    with_argmax: bool = False,
) -> bytes:
    """Convert the inference program to a TFLite flatbuffer.

    int8 mirrors the reference's PTQ settings
    (post_train_quant_convert.py:40-56): Optimize.DEFAULT with a
    representative dataset of normalized input batches; float I/O.
    """
    tf = _require_tf()
    cf = _tf_concrete_fn(
        model, variables, input_shape, batch_size, with_argmax=with_argmax
    )
    converter = tf.lite.TFLiteConverter.from_concrete_functions([cf])
    if quantize == "int8":
        if representative_data is None:
            raise ValueError("int8 quantization needs representative_data")
        converter.optimizations = [tf.lite.Optimize.DEFAULT]

        def gen():
            for batch in representative_data:
                yield [np.asarray(batch, np.float32)]

        converter.representative_dataset = gen
    elif quantize == "float16":
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
        converter.target_spec.supported_types = [tf.float16]
    elif quantize is not None:
        raise ValueError(f"unknown quantize mode {quantize!r}")
    return converter.convert()


def save_tflite(content: bytes, path: str) -> None:
    with open(path, "wb") as f:
        f.write(content)


def export_saved_model(
    model, variables, input_shape: tuple[int, int], path: str,
    batch_size: int = 1,
) -> None:
    """SavedModel with a single serving signature (reference
    deeplab.py:112-120 dump_saved_model)."""
    tf = _require_tf()
    cf = _tf_concrete_fn(model, variables, input_shape, batch_size)
    module = tf.Module()
    module.serve = tf.function(
        lambda image_input: cf(image_input),
        input_signature=cf.structured_input_signature[0],
    )
    tf.saved_model.save(
        module, path, signatures={"serving_default": module.serve}
    )


def export_frozen_pb(
    model, variables, input_shape: tuple[int, int], path: str,
    batch_size: int = 1,
) -> tuple[str, str]:
    """Frozen GraphDef .pb — constants folded, single input/output
    (reference keras_to_tensorflow.py:82+). Returns (input, output)
    tensor names for downstream consumers (e.g. rknn-toolkit)."""
    tf = _require_tf()
    from tensorflow.python.framework.convert_to_constants import (
        convert_variables_to_constants_v2,
    )

    cf = _tf_concrete_fn(model, variables, input_shape, batch_size)
    frozen = convert_variables_to_constants_v2(cf)
    graph_def = frozen.graph.as_graph_def()
    tf.io.write_graph(
        graph_def,
        logdir=str(__import__("os").path.dirname(path) or "."),
        name=str(__import__("os").path.basename(path)),
        as_text=False,
    )
    in_name = frozen.inputs[0].name
    out_name = frozen.outputs[0].name
    return in_name, out_name


class TFLiteRunner:
    """Per-sample predictor over a .tflite artifact (reference
    eval.py:84-113 tflite branch semantics: set input, invoke, fetch)."""

    def __init__(self, path_or_content):
        tf = _require_tf()
        if isinstance(path_or_content, (bytes, bytearray)):
            self._interp = tf.lite.Interpreter(
                model_content=bytes(path_or_content)
            )
        else:
            self._interp = tf.lite.Interpreter(model_path=path_or_content)
        self._interp.allocate_tensors()
        self._in = self._interp.get_input_details()[0]
        self._out = self._interp.get_output_details()[0]

    @property
    def input_shape(self) -> tuple:
        return tuple(self._in["shape"])

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """images (B,H,W,3) f32 → (B,H,W,C) probabilities. TFLite graphs
        are compiled at a fixed batch; loop in model-batch chunks."""
        images = np.asarray(images, np.float32)
        mb = int(self._in["shape"][0])
        outs = []
        for i in range(0, images.shape[0], mb):
            chunk = images[i : i + mb]
            pad = mb - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, *chunk.shape[1:]), np.float32)]
                )
            self._interp.set_tensor(self._in["index"], chunk)
            self._interp.invoke()
            got = self._interp.get_tensor(self._out["index"])
            outs.append(got[: mb - pad] if pad else got)
        return np.concatenate(outs, axis=0)


class FrozenGraphRunner:
    """Predictor over a frozen .pb (reference eval.py:116-143 pb branch:
    wrap the GraphDef, feed image_input, fetch the softmax output)."""

    def __init__(self, path: str, input_name: Optional[str] = None,
                 output_name: Optional[str] = None):
        tf = _require_tf()
        graph_def = tf.compat.v1.GraphDef()
        with open(path, "rb") as f:
            graph_def.ParseFromString(f.read())

        if input_name is None:
            # our exporter names the input 'image_input' (reference
            # convention); for foreign graphs fall back to the unique
            # Placeholder
            names = {n.name for n in graph_def.node}
            if "image_input" in names:
                input_name = "image_input:0"
            else:
                ph = [n.name for n in graph_def.node
                      if n.op == "Placeholder"]
                if len(ph) != 1:
                    raise ValueError(
                        f"cannot infer the input tensor (placeholders: "
                        f"{ph}); pass input_name explicitly"
                    )
                input_name = ph[0] + ":0"
        if output_name is None:
            # GraphDef node order is not a contract — find TERMINAL nodes
            # (no consumers) and prefer well-known output names: the
            # reference's keras_to_tensorflow.py graphs end in
            # 'pred_mask/Softmax', ours in an Identity
            consumed = {
                inp.lstrip("^").split(":")[0]
                for node in graph_def.node for inp in node.input
            }
            terminals = [
                n.name for n in graph_def.node
                if n.name not in consumed
                and n.op not in ("Placeholder", "Const", "NoOp", "Assert")
            ]
            preferred = [
                n for n in terminals
                if "pred_mask" in n or "Softmax" in n
                or n.split("/")[-1].startswith("Identity")
            ]
            pick = preferred or terminals
            if len(pick) != 1:
                raise ValueError(
                    f"cannot infer the output tensor (terminal nodes: "
                    f"{terminals}); pass output_name explicitly"
                )
            output_name = pick[0] + ":0"

        def _imports():
            tf.compat.v1.import_graph_def(graph_def, name="")

        wrapped = tf.compat.v1.wrap_function(_imports, [])
        self._fn = wrapped.prune(
            tf.nest.map_structure(
                wrapped.graph.as_graph_element, input_name
            ),
            tf.nest.map_structure(
                wrapped.graph.as_graph_element, output_name
            ),
        )
        self._batch = int(
            wrapped.graph.get_tensor_by_name(input_name).shape[0] or 1
        )

    def __call__(self, images: np.ndarray) -> np.ndarray:
        import tensorflow as tf

        images = np.asarray(images, np.float32)
        mb = self._batch
        outs = []
        for i in range(0, images.shape[0], mb):
            chunk = images[i : i + mb]
            pad = mb - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, *chunk.shape[1:]), np.float32)]
                )
            got = self._fn(tf.constant(chunk)).numpy()
            outs.append(got[: mb - pad] if pad else got)
        return np.concatenate(outs, axis=0)
