#!/usr/bin/env python3
"""Model export CLI — TPU-native face of the reference's converter suite
(/root/reference/tools/model_converter/: keras_to_tensorflow.py,
keras_to_tflite.py, post_train_quant_convert.py).

Converts a flax checkpoint (or imports a reference Keras .h5) into:
* a serialized StableHLO inference artifact (`--format shlo`) — the
  portable deployment format replacing frozen-pb/TFLite (C24/C26);
* an int8 post-training-quantized checkpoint (`--format int8`) with
  optional representative-dataset activation calibration (C27, reference
  post_train_quant_convert.py:20-57);
* a plain re-saved flax checkpoint (`--format ckpt`, e.g. after h5 import).

Usage:
  python export_model.py --model_path trained_final.ckpt \
      --model_type mobilenetv2_lite --num_classes 21 \
      --model_input_shape 512 --format shlo --output model.shlo
  python export_model.py ... --format int8 --output model_int8.ckpt \
      [--dataset_path VOC2012 --dataset_file VOC2012/val.txt]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    from deeplabv3p_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", required=True, help=".ckpt or Keras .h5")
    p.add_argument("--model_type", default="mobilenetv2_lite")
    p.add_argument("--num_classes", type=int, default=21)
    p.add_argument("--model_input_shape", type=int, default=512)
    p.add_argument("--output_stride", type=int, default=16)
    p.add_argument(
        "--format", default="shlo",
        choices=["shlo", "int8", "ckpt", "tflite", "tflite_int8",
                 "tflite_f16", "saved_model", "pb"],
        help="shlo/int8/ckpt are TF-free; tflite*/saved_model/pb require "
             "tensorflow (reference keras_to_tflite.py, "
             "post_train_quant_convert.py, keras_to_tensorflow.py)")
    p.add_argument("--output", required=True)
    p.add_argument("--with_argmax", action="store_true",
                   help="fuse argmax into the exported program "
                        "(reference model.py:82-90 comment)")
    p.add_argument("--dataset_path", default=None,
                   help="representative dataset root for int8 calibration")
    p.add_argument("--dataset_file", default=None)
    p.add_argument("--calib_batches", type=int, default=4)
    from deeplabv3p_tpu.utils.device import add_device_arg, apply_device_arg

    add_device_arg(p)
    args = p.parse_args()
    apply_device_arg(args)

    import jax
    import jax.numpy as jnp

    from deeplabv3p_tpu.models.factory import build_segmentation_model
    from deeplabv3p_tpu.utils.checkpoint import load_variables, save_variables

    shape = (args.model_input_shape, args.model_input_shape)
    model = build_segmentation_model(
        args.model_type, args.num_classes, output_stride=args.output_stride
    )
    if args.model_path.endswith(".h5"):
        from deeplabv3p_tpu.utils.keras_import import load_keras_h5_weights

        x = jnp.zeros((1, *shape, 3), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        variables = load_keras_h5_weights(args.model_path, variables)
    else:
        variables = load_variables(args.model_path)

    if args.format == "shlo":
        from deeplabv3p_tpu.export.stablehlo import export_model, save_exported

        exported = export_model(
            model, variables, shape, with_argmax=args.with_argmax
        )
        save_exported(exported, args.output)
        print(f"exported StableHLO artifact to {args.output}")
    elif args.format == "int8":
        import numpy as np

        from deeplabv3p_tpu.export.quantize import (
            calibrate_activations,
            post_train_quantize,
        )

        qparams, stats = post_train_quantize(variables["params"])
        print(
            f"quantized {stats['quantized_kernels']} kernels, "
            f"{stats['compression']:.2f}x weight compression"
        )
        payload = {
            "quantized_params": qparams,
            "batch_stats": variables["batch_stats"],
        }
        if args.dataset_path and args.dataset_file:
            from deeplabv3p_tpu.data.pipeline import SegmentationDataset
            from deeplabv3p_tpu.utils.config import get_data_list

            ds = SegmentationDataset(
                args.dataset_path,
                get_data_list(args.dataset_file, shuffle=False),
                batch_size=1, num_classes=args.num_classes,
                input_shape=shape, augment=False, shuffle=False,
            )
            batches = []
            for i, (img, _, _) in enumerate(ds.epoch_batches()):
                if i >= args.calib_batches:
                    break
                batches.append(img.astype(np.float32) / 127.5 - 1.0)
            ranges = calibrate_activations(model, variables, batches)
            payload["activation_ranges"] = {
                k: list(v) for k, v in ranges.items()
            }
            print(f"calibrated {len(ranges)} activation ranges")
        save_variables(args.output, payload)
        print(f"saved int8 model to {args.output}")
    elif args.format in ("tflite", "tflite_int8", "tflite_f16"):
        import numpy as np

        from deeplabv3p_tpu.export.tf_export import export_tflite, save_tflite

        quantize = {"tflite": None, "tflite_int8": "int8",
                    "tflite_f16": "float16"}[args.format]
        rep = None
        if quantize == "int8":
            rep = _representative_batches(args, shape, np)
        content = export_tflite(
            model, variables, shape, quantize=quantize,
            representative_data=rep, with_argmax=args.with_argmax,
        )
        save_tflite(content, args.output)
        print(f"exported {args.format} model ({len(content)} bytes) "
              f"to {args.output}")
    elif args.format == "saved_model":
        from deeplabv3p_tpu.export.tf_export import export_saved_model

        export_saved_model(model, variables, shape, args.output)
        print(f"exported SavedModel to {args.output}")
    elif args.format == "pb":
        from deeplabv3p_tpu.export.tf_export import export_frozen_pb

        in_name, out_name = export_frozen_pb(
            model, variables, shape, args.output
        )
        print(f"exported frozen pb to {args.output} "
              f"(input={in_name}, output={out_name})")
    else:
        save_variables(args.output, variables)
        print(f"saved checkpoint to {args.output}")


def _representative_batches(args, shape, np):
    """Representative input batches for int8 calibration: the real dataset
    when given (reference post_train_quant_convert.py:24-38), else random
    normalized images so the CLI still produces a valid artifact."""
    if args.dataset_path and args.dataset_file:
        from deeplabv3p_tpu.data.pipeline import SegmentationDataset
        from deeplabv3p_tpu.utils.config import get_data_list

        ds = SegmentationDataset(
            args.dataset_path,
            get_data_list(args.dataset_file, shuffle=False),
            batch_size=1, num_classes=args.num_classes,
            input_shape=shape, augment=False, shuffle=False,
        )
        batches = []
        for i, (img, _, _) in enumerate(ds.epoch_batches()):
            if i >= args.calib_batches:
                break
            batches.append(img.astype(np.float32) / 127.5 - 1.0)
        return batches
    rng = np.random.RandomState(0)
    return [
        rng.uniform(-1, 1, (1, *shape, 3)).astype(np.float32)
        for _ in range(args.calib_batches)
    ]


if __name__ == "__main__":
    main()
