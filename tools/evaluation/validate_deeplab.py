#!/usr/bin/env python3
"""Golden single-image validation across model artifacts.

Port of /root/reference/tools/evaluation/validate_deeplab.py:27-409: runs
one image through a model artifact (flax .ckpt, StableHLO .shlo, or Keras
.h5 import), visualizes the segmentation, and — when a GT label is given —
prints the single-pair mIOU (reference handle_prediction :322-352).
"""

import argparse
import os
import sys
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def validate(model_path, model_type, image_file, classes_path, input_shape,
             output_stride=16, label_file=None, loop_count=1, output="."):
    import jax
    import jax.numpy as jnp

    from deeplabv3p_tpu.inference import preprocess_image
    from deeplabv3p_tpu.metrics import mIOU_numpy
    from deeplabv3p_tpu.postprocess import mask_resize
    from deeplabv3p_tpu.utils.config import get_classes
    from deeplabv3p_tpu.utils.visualize import visualize_segmentation

    class_names = get_classes(classes_path)
    num_classes = len(class_names)

    if model_path.endswith(".shlo"):
        from deeplabv3p_tpu.export.stablehlo import load_exported

        fn = jax.jit(load_exported(model_path))
    else:
        from deeplabv3p_tpu.models.factory import build_deeplab_model
        from deeplabv3p_tpu.utils.checkpoint import load_variables
        from deeplabv3p_tpu.utils.keras_import import load_keras_h5_weights

        model = build_deeplab_model(
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

    image = Image.open(image_file).convert("RGB")
    image_data = preprocess_image(image, input_shape)

    probs = np.asarray(fn(jnp.asarray(image_data)))  # compile
    t0 = time.time()
    for _ in range(loop_count):
        probs = np.asarray(fn(jnp.asarray(image_data)))
    print(f"average inference time: {(time.time() - t0) / loop_count * 1e3:.2f} ms")

    mask = np.argmax(probs[0], axis=-1)
    origin_hw = tuple(reversed(image.size))
    mask = np.asarray(mask_resize(jnp.asarray(mask), origin_hw))

    gt_mask = None
    if label_file:
        gt_mask = np.array(Image.open(label_file))
        if gt_mask.ndim == 3:
            gt_mask = gt_mask[..., 0]
        print("mIOU vs GT:", mIOU_numpy(gt_mask, mask))

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


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", required=True)
    p.add_argument("--model_type", default="mobilenetv2_lite")
    p.add_argument("--image_file", required=True)
    p.add_argument("--label_file", default=None)
    p.add_argument("--classes_path", required=True)
    p.add_argument("--model_input_shape", type=int, default=512)
    p.add_argument("--output_stride", type=int, default=16)
    p.add_argument("--loop_count", type=int, default=1)
    p.add_argument("--output_path", default=".")
    args = p.parse_args()
    validate(
        args.model_path, args.model_type, args.image_file,
        args.classes_path,
        (args.model_input_shape, args.model_input_shape),
        args.output_stride, args.label_file, args.loop_count,
        args.output_path,
    )


if __name__ == "__main__":
    main()
