#!/usr/bin/env python3
"""Golden single-image validation across model artifacts and engines.

Port of /root/reference/tools/evaluation/validate_deeplab.py:27-409: the
reference runs ONE image through any of its export formats
(H5/PB/ONNX/TFLite/MNN) and visually compares the outputs. Here
`--model_path` accepts a comma-separated list of artifacts; each is
dispatched by extension to its engine:

  .ckpt / .h5       native JAX forward (flax checkpoint / Keras import)
  .shlo             exported StableHLO artifact
  .onnx             bundled numpy ONNX interpreter (export/onnx/interp.py)
  .tflite / .pb     TFLite Interpreter / frozen GraphDef (requires TF)
  native:<path>     the C++ `deeplabSegment` binary (its pure-C++ ONNX
                    engine for .onnx; the embedded-CPython engine
                    otherwise), fed the exact preprocessed tensor via
                    --input_raw so the diff is engine-only

With several artifacts the tool prints per-engine probability and argmax
diffs against the FIRST one (the reference's cross-engine diff role) and
per-engine mIOU when a GT label is given (handle_prediction :322-352).
"""

import argparse
import os
import sys
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def make_engine(model_path, model_type, num_classes, input_shape,
                output_stride=16):
    """Returns fn(image_data (1,H,W,3) f32) -> probs (1,H,W,C) f32."""
    import jax
    import jax.numpy as jnp

    if model_path.startswith("native:"):
        artifact = model_path[len("native:"):]
        binary = os.environ.get(
            "DEEPLAB_NATIVE_BIN",
            os.path.join(os.path.dirname(__file__), "..", "..",
                         "inference", "build", "deeplabSegment"),
        )
        if not os.path.exists(binary):
            raise FileNotFoundError(
                f"native binary not found at {binary} — build it "
                "(cd inference && cmake -B build && make -C build) or set "
                "DEEPLAB_NATIVE_BIN"
            )

        def fn_native(x):
            import subprocess
            import tempfile

            x = np.ascontiguousarray(np.asarray(x, np.float32))
            _, h, w, _ = x.shape
            with tempfile.TemporaryDirectory() as td:
                raw_in = os.path.join(td, "in.bin")
                raw_out = os.path.join(td, "out.bin")
                x.tofile(raw_in)
                res = subprocess.run(
                    [binary, "--model_path", artifact,
                     "--input_raw", raw_in,
                     "--input_shape", f"{h}x{w}",
                     "--classes", str(num_classes),
                     "--dump_raw", raw_out,
                     "--output", os.path.join(td, "mask.png")],
                    capture_output=True, text=True,
                )
                if res.returncode != 0:
                    raise RuntimeError(
                        f"deeplabSegment failed: {res.stderr[-800:]}"
                    )
                probs = np.fromfile(raw_out, np.float32)
            return probs.reshape(1, h, w, -1)

        return fn_native
    if model_path.endswith(".shlo"):
        from deeplabv3p_tpu.export.stablehlo import load_exported

        fn = jax.jit(load_exported(model_path))
        return lambda x: np.asarray(fn(jnp.asarray(x)))
    if model_path.endswith(".onnx"):
        from deeplabv3p_tpu.export.onnx.convert import load_onnx
        from deeplabv3p_tpu.export.onnx.interp import run_model

        onnx_model = load_onnx(model_path)
        in_name = onnx_model.graph.input[0].name
        out_name = onnx_model.graph.output[0].name

        def fn_onnx(x):
            probs = run_model(
                onnx_model, {in_name: np.asarray(x, np.float32)}
            )[out_name]
            if probs.shape[1] == num_classes:  # NCHW output (onnx_edit)
                probs = probs.transpose(0, 2, 3, 1)
            return probs

        return fn_onnx
    if model_path.endswith(".tflite"):
        from deeplabv3p_tpu.export.tf_export import TFLiteRunner

        runner = TFLiteRunner(model_path)
        return lambda x: np.asarray(runner(np.asarray(x, np.float32)))
    if model_path.endswith(".pb"):
        from deeplabv3p_tpu.export.tf_export import FrozenGraphRunner

        runner = FrozenGraphRunner(model_path)
        return lambda x: np.asarray(runner(np.asarray(x, np.float32)))

    from deeplabv3p_tpu.models.factory import build_segmentation_model
    from deeplabv3p_tpu.utils.checkpoint import load_variables
    from deeplabv3p_tpu.utils.keras_import import load_keras_h5_weights

    model = build_segmentation_model(
        model_type, num_classes, output_stride=output_stride
    )
    if model_path.endswith(".h5"):
        x0 = jnp.zeros((1, *input_shape, 3), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
        variables = load_keras_h5_weights(model_path, variables)
    else:
        variables = load_variables(model_path)
    fn = jax.jit(
        lambda im: jax.nn.softmax(
            model.apply(variables, im, train=False), axis=-1
        )
    )
    return lambda x: np.asarray(fn(jnp.asarray(x)))


def validate(model_paths, model_type, image_file, classes_path, input_shape,
             output_stride=16, label_file=None, loop_count=1, output="."):
    import jax.numpy as jnp

    from deeplabv3p_tpu.inference import preprocess_image
    from deeplabv3p_tpu.metrics import mIOU_numpy
    from deeplabv3p_tpu.postprocess import mask_resize
    from deeplabv3p_tpu.utils.config import get_classes
    from deeplabv3p_tpu.utils.visualize import visualize_segmentation

    class_names = get_classes(classes_path)
    num_classes = len(class_names)

    image = Image.open(image_file).convert("RGB")
    image_data = preprocess_image(image, input_shape)
    origin_hw = tuple(reversed(image.size))

    gt_mask = None
    if label_file:
        gt_mask = np.array(Image.open(label_file))
        if gt_mask.ndim == 3:
            gt_mask = gt_mask[..., 0]

    results = {}  # path -> (probs (H,W,C), mask at origin size)
    for path in model_paths:
        fn = make_engine(
            path, model_type, num_classes, input_shape, output_stride
        )
        probs = fn(image_data)  # warm-up / compile
        t0 = time.time()
        for _ in range(loop_count):
            probs = fn(image_data)
        dt = (time.time() - t0) / loop_count * 1e3
        mask = np.argmax(probs[0], axis=-1)
        mask = np.asarray(mask_resize(jnp.asarray(mask), origin_hw))
        results[path] = (np.asarray(probs[0], np.float32), mask)
        line = f"[{os.path.basename(path)}] avg inference {dt:.2f} ms"
        if gt_mask is not None:
            line += f"  mIOU vs GT: {mIOU_numpy(gt_mask, mask):.4f}"
        print(line)

    # cross-engine diff vs the first artifact (reference validate role)
    paths = list(results)
    if len(paths) > 1:
        ref_probs, ref_mask = results[paths[0]]
        print(f"\ncross-engine diff vs {os.path.basename(paths[0])}:")
        for path in paths[1:]:
            probs, mask = results[path]
            max_dp = float(np.abs(probs - ref_probs).max())
            mean_dp = float(np.abs(probs - ref_probs).mean())
            agree = float((mask == ref_mask).mean())
            print(
                f"  {os.path.basename(path)}: max|dprob|={max_dp:.3e} "
                f"mean|dprob|={mean_dp:.3e} argmax_agree={agree:.6f}"
            )

    # visualize the FIRST engine's prediction (reference behavior)
    mask = results[paths[0]][1]
    arr = visualize_segmentation(
        np.array(image), mask, gt_mask, class_names=class_names,
        title="Predict Segmentation",
        gt_title="GT Segmentation" if gt_mask is not None else None,
    )
    out = os.path.join(
        output,
        os.path.splitext(os.path.basename(image_file))[0] + "_validate.jpg",
    )
    Image.fromarray(arr).save(out)
    print("saved visualization to", out)
    return results


def main():
    from deeplabv3p_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", required=True,
                   help="one artifact, or a comma-separated list "
                        "(.ckpt/.h5/.shlo/.onnx/.tflite/.pb, or "
                        "native:<artifact> for the C++ binary) for a "
                        "cross-engine diff")
    p.add_argument("--model_type", default="mobilenetv2_lite")
    p.add_argument("--image_file", required=True)
    p.add_argument("--label_file", default=None)
    p.add_argument("--classes_path", required=True)
    p.add_argument("--model_input_shape", type=int, default=512)
    p.add_argument("--output_stride", type=int, default=16)
    p.add_argument("--loop_count", type=int, default=1)
    p.add_argument("--output_path", default=".")
    from deeplabv3p_tpu.utils.device import add_device_arg, apply_device_arg

    add_device_arg(p)
    args = p.parse_args()
    apply_device_arg(args)
    validate(
        [s for s in args.model_path.split(",") if s],
        args.model_type, args.image_file,
        args.classes_path,
        (args.model_input_shape, args.model_input_shape),
        args.output_stride, args.label_file, args.loop_count,
        args.output_path,
    )


if __name__ == "__main__":
    main()
