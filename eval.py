#!/usr/bin/env python3
"""Evaluation CLI — TPU-native counterpart of /root/reference/eval.py.

Computes streaming mIoU/FWIoU/PixelAcc/mClassAcc + per-class IoU over a
dataset, with optional CRF postprocess, per-image result dumps, and
mIOU/confusion-matrix plots.

Example:
  python eval.py --model_path=logs/000/trained_final.ckpt \
      --model_type=mobilenetv2_lite --dataset_path=VOC2012 \
      --dataset_file=VOC2012/val.txt --classes_path=configs/voc_classes.txt
"""

import argparse

import jax
import jax.numpy as jnp

from deeplabv3p_tpu.eval import eval_miou
from deeplabv3p_tpu.models.factory import build_segmentation_model
from deeplabv3p_tpu.utils.checkpoint import load_variables
from deeplabv3p_tpu.utils.config import get_classes, get_data_list


def parse_input_shape(spec):
    """'512' -> (512, 512); '1024x512' -> (1024, 512)."""
    parts = str(spec).lower().split("x")
    if len(parts) == 1:
        v = int(parts[0])
        return (v, v)
    return (int(parts[0]), int(parts[1]))


def main(args):
    if args.device == "cpu":
        # must happen before any backend use; the environment pins
        # jax_platforms programmatically, so plain JAX_PLATFORMS env is
        # ignored (CLAUDE.md rule 3)
        jax.config.update("jax_platforms", "cpu")
    from deeplabv3p_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    class_names = get_classes(args.classes_path)
    num_classes = len(class_names)
    input_shape = parse_input_shape(args.model_input_shape)

    # fused Pallas ASPP on real TPU only (equality-tested vs the standard
    # path; off-TPU it would run the slow interpreter)
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    model = build_segmentation_model(
        args.model_type, num_classes, output_stride=args.output_stride,
        dtype=jnp.bfloat16, fused_aspp=on_tpu,
    )
    if args.model_path.endswith(".shlo"):
        # exported StableHLO artifact: weights baked in; wrap as a
        # pseudo-model so eval_miou's apply() path works unchanged
        from deeplabv3p_tpu.export.stablehlo import load_exported

        fn = load_exported(args.model_path)

        class _ExportedModel:
            def apply(self, variables, images, train=False):
                return fn(images)

        model, variables = _ExportedModel(), {}
    elif args.model_path.endswith(".onnx"):
        # exported ONNX artifact (reference eval.py:542-575 dispatches on
        # extension the same way); executed with the bundled numpy
        # interpreter — slow, meant for deployment-artifact verification
        import numpy as np

        from deeplabv3p_tpu.export.onnx.convert import load_onnx
        from deeplabv3p_tpu.export.onnx.interp import run_model

        onnx_model = load_onnx(args.model_path)
        in_name = onnx_model.graph.input[0].name
        out_name = onnx_model.graph.output[0].name

        class _OnnxModel:
            jittable = False  # host-side numpy engine

            def apply(self, variables, images, train=False):
                probs = run_model(
                    onnx_model, {in_name: np.asarray(images, np.float32)}
                )[out_name]
                if probs.shape[1] == len(class_names):  # NCHW output
                    probs = probs.transpose(0, 2, 3, 1)
                return jnp.asarray(probs)

        model, variables = _OnnxModel(), {}
    elif args.model_path.endswith(".tflite") or args.model_path.endswith(".pb"):
        # TFLite flatbuffer / frozen GraphDef (reference eval.py:84-143
        # dispatches both the same way); requires tensorflow (gated)
        import numpy as np

        from deeplabv3p_tpu.export.tf_export import (
            FrozenGraphRunner,
            TFLiteRunner,
        )

        if args.model_path.endswith(".tflite"):
            runner = TFLiteRunner(args.model_path)
        else:
            runner = FrozenGraphRunner(
                args.model_path,
                input_name=args.pb_input_node,
                output_name=args.pb_output_node,
            )

        class _TFModel:
            jittable = False  # host-side TF/TFLite engine

            def apply(self, variables, images, train=False):
                probs = runner(np.asarray(images, np.float32))
                return jnp.asarray(probs)

        model, variables = _TFModel(), {}
    elif args.model_path.endswith(".h5"):
        # reference Keras checkpoints import by layer name
        from deeplabv3p_tpu.utils.keras_import import load_keras_h5_weights

        x = jnp.zeros((1, *input_shape, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        variables = load_keras_h5_weights(args.model_path, variables)
    else:
        template = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, *input_shape, 3), jnp.float32)
        )
        variables = load_variables(args.model_path, template)

    data_list = get_data_list(args.dataset_file, shuffle=False)
    eval_miou(
        model, variables, args.dataset_path, data_list, class_names,
        model_input_shape=input_shape, batch_size=args.batch_size,
        do_crf=args.do_crf, save_result=args.save_result, plots=True,
    )


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", required=True,
                   help=".ckpt (native) or .h5 (Keras reference) checkpoint")
    p.add_argument("--model_type", default="mobilenetv3large_lite")
    p.add_argument("--model_input_shape", default="512x512",
                   help="HxW (e.g. 512x512 or 1024x512) or a single int")
    p.add_argument("--output_stride", type=int, default=16, choices=[8, 16, 32])
    p.add_argument("--dataset_path", default="VOC2012/")
    p.add_argument("--dataset_file", default="VOC2012/val.txt")
    p.add_argument("--classes_path", default="configs/voc_classes.txt")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--pb_input_node", default=None,
                   help="input tensor name for externally produced .pb "
                        "graphs (default: image_input:0 / the unique "
                        "Placeholder)")
    p.add_argument("--pb_output_node", default=None,
                   help="output tensor name for externally produced .pb "
                        "graphs (default: inferred from terminal nodes)")
    p.add_argument("--do_crf", action="store_true")
    p.add_argument("--save_result", action="store_true")
    p.add_argument("--device", default="auto", choices=["auto", "cpu"],
                   help="force the CPU backend (e.g. for .onnx artifacts)")
    return p.parse_args()


if __name__ == "__main__":
    main(parse_args())
