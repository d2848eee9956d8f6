#!/usr/bin/env python3
"""Dump intermediate feature maps for cross-implementation diffing.

Port of /root/reference/tools/evaluation/featuremap_check.py:33-105: runs
one image through the model, captures every module's output (flax
`capture_intermediates`), and saves per-layer activation grids as PNGs
plus raw .npy tensors for numeric comparison against the reference.
"""

import argparse
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def dump_featuremaps(model_type, weights_path, image_file, output_path,
                     num_classes=21, input_shape=(512, 512),
                     output_stride=16, layers=None, save_png=True):
    import jax
    import jax.numpy as jnp

    from deeplabv3p_tpu.inference import preprocess_image
    from deeplabv3p_tpu.models.factory import build_deeplab_model
    from deeplabv3p_tpu.utils.checkpoint import load_variables

    model = build_deeplab_model(
        model_type, num_classes, output_stride=output_stride
    )
    if weights_path:
        variables = load_variables(weights_path)
    else:
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, *input_shape, 3))
        )

    image = Image.open(image_file).convert("RGB")
    x = jnp.asarray(preprocess_image(image, input_shape))

    _, state = model.apply(
        variables, x, train=False,
        capture_intermediates=True, mutable=["intermediates"],
    )

    os.makedirs(output_path, exist_ok=True)
    flat = jax.tree_util.tree_flatten_with_path(state["intermediates"])[0]
    count = 0
    for path, value in flat:
        name = "_".join(
            str(getattr(p, "key", p)) for p in path
        ).replace("__call__", "out")
        if layers and not any(l in name for l in layers):
            continue
        arr = np.asarray(value)
        np.save(os.path.join(output_path, name + ".npy"), arr)
        if save_png and arr.ndim == 4:
            # tile up to 64 channels as a grayscale grid
            a = arr[0]
            c = min(a.shape[-1], 64)
            cols = 8
            rows = (c + cols - 1) // cols
            h, w = a.shape[0], a.shape[1]
            grid = np.zeros((rows * h, cols * w), np.float32)
            for i in range(c):
                r, col = divmod(i, cols)
                ch = a[..., i]
                lo, hi = ch.min(), ch.max()
                grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = (
                    (ch - lo) / (hi - lo + 1e-8)
                )
            Image.fromarray((grid * 255).astype(np.uint8)).save(
                os.path.join(output_path, name + ".png")
            )
        count += 1
    print(f"dumped {count} feature maps to {output_path}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_type", default="mobilenetv2_lite")
    p.add_argument("--weights_path", default=None)
    p.add_argument("--image_file", required=True)
    p.add_argument("--output_path", default="featuremaps")
    p.add_argument("--num_classes", type=int, default=21)
    p.add_argument("--model_input_shape", type=int, default=512)
    p.add_argument("--layers", default=None,
                   help="comma-separated substrings to filter layer names")
    from deeplabv3p_tpu.utils.device import add_device_arg, apply_device_arg

    add_device_arg(p)
    args = p.parse_args()
    apply_device_arg(args)
    dump_featuremaps(
        args.model_type, args.weights_path, args.image_file,
        args.output_path, args.num_classes,
        (args.model_input_shape, args.model_input_shape),
        layers=args.layers.split(",") if args.layers else None,
    )


if __name__ == "__main__":
    main()
