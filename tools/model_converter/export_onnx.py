#!/usr/bin/env python3
"""Model → ONNX converter CLI (reference keras_to_onnx.py:34-56).

Builds the requested model in f32, loads weights (.h5 Keras layout or
native .ckpt msgpack), and writes `<output>.onnx` containing the full
inference graph (preprocess-normalized input → softmax probabilities)
with the reference's IO naming: input `image_input`, output
`pred_mask/Softmax` (what the RKNN/MNN consumers expect,
tensorflow_to_rknn.py:40-41).

Runs entirely on CPU (constant folding evaluates host-side).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from deeplabv3p_tpu.export.onnx import export_onnx, save_onnx  # noqa: E402
from deeplabv3p_tpu.models.factory import build_segmentation_model  # noqa: E402
from deeplabv3p_tpu.utils.config import get_classes  # noqa: E402


def convert(
    model_type: str,
    num_classes: int,
    weights_path: str | None,
    model_input_shape: tuple[int, int],
    output_stride: int,
    output_path: str,
    nchw_output: bool = False,
    batch_size: int = 1,
):
    """NOTE: like StableHLO export, the emitted graph is static-shape —
    the batch dimension is baked in (XLA-style; pick batch_size to match
    the deployment)."""
    model = build_segmentation_model(
        model_type, num_classes, output_stride=output_stride
    )
    x = jnp.zeros((batch_size, *model_input_shape, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    if weights_path and weights_path.endswith(".h5"):
        from deeplabv3p_tpu.utils.keras_import import load_keras_h5_weights

        variables = load_keras_h5_weights(weights_path, variables)
    elif weights_path:
        from deeplabv3p_tpu.utils.checkpoint import load_variables

        variables = load_variables(weights_path)

    def fn(images):
        logits = model.apply(variables, images, train=False)
        return jax.nn.softmax(logits, axis=-1)

    onnx_model = export_onnx(
        fn, (x,),
        model_name=model_type,
        input_names=["image_input"],
        output_names=["pred_mask/Softmax"],
        doc_string=f"{model_type} {model_input_shape} OS{output_stride}",
    )
    if nchw_output:
        from tools.model_converter.onnx_edit import add_nchw_output

        add_nchw_output(onnx_model)
    save_onnx(onnx_model, output_path)
    print(
        f"wrote {output_path}: {len(onnx_model.graph.node)} nodes, "
        f"{len(onnx_model.graph.initializer)} initializers, "
        f"{os.path.getsize(output_path)} bytes"
    )
    return onnx_model


def main():
    parser = argparse.ArgumentParser(
        description="Convert a model to ONNX (reference keras_to_onnx.py)"
    )
    parser.add_argument("--model_type", default="mobilenetv2_lite")
    parser.add_argument("--classes_path", default="configs/voc_classes.txt")
    parser.add_argument("--weights_path", default=None)
    parser.add_argument("--model_input_shape", default="512x512",
                        help="<h>x<w>")
    parser.add_argument("--output_stride", type=int, default=16)
    parser.add_argument("--output_path", required=True)
    parser.add_argument("--batch_size", type=int, default=1,
                        help="static batch size baked into the graph")
    parser.add_argument("--nchw_output", action="store_true",
                        help="emit NCHW output layout (reference "
                        "onnx_edit.py behaviour)")
    from deeplabv3p_tpu.utils.device import add_device_arg, apply_device_arg

    add_device_arg(parser)
    args = parser.parse_args()
    apply_device_arg(args)
    h, w = map(int, args.model_input_shape.split("x"))
    num_classes = len(get_classes(args.classes_path))
    convert(
        args.model_type, num_classes, args.weights_path, (h, w),
        args.output_stride, args.output_path, args.nchw_output,
        args.batch_size,
    )


if __name__ == "__main__":
    main()
