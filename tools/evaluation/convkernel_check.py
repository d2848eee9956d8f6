#!/usr/bin/env python3
"""Conv-kernel visualization by gradient ascent on the input.

Port of /root/reference/tools/evaluation/convkernel_check.py:57-143: for
each filter of a chosen layer, optimize a random input image to maximize
that filter's mean activation (the classic "what does this kernel look
for" visualization), then tile the results into a grid PNG.

The whole ascent loop runs as one jitted lax.fori_loop on device (the
reference iterates GradientTape steps in Python).
"""

import argparse
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def visualize_kernels(model_type, weights_path, layer_substr, num_filters=16,
                      image_size=128, steps=30, lr=10.0, num_classes=21,
                      output_stride=16, out_path="kernel_viz.png"):
    import jax
    import jax.numpy as jnp

    from deeplabv3p_tpu.models.factory import build_segmentation_model
    from deeplabv3p_tpu.utils.checkpoint import load_variables

    model = build_segmentation_model(
        model_type, num_classes, output_stride=output_stride
    )
    if weights_path:
        variables = load_variables(weights_path)
    else:
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, image_size, image_size, 3), jnp.float32),
        )

    def activation_of(images, filter_index):
        """Mean activation of `filter_index` in the first intermediate
        whose path contains `layer_substr`."""
        _, state = model.apply(
            variables, images, train=False,
            capture_intermediates=True, mutable=["intermediates"],
        )
        flat = jax.tree_util.tree_flatten_with_path(state["intermediates"])[0]
        for path, value in flat:
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            if layer_substr in name and value.ndim == 4:
                return jnp.mean(value[..., filter_index])
        raise ValueError(f"no 4-D intermediate matching {layer_substr!r}")

    @jax.jit
    def ascend(image, filter_index):
        def body(_, img):
            grad = jax.grad(lambda im: activation_of(im, filter_index))(img)
            grad = grad / (jnp.sqrt(jnp.mean(grad**2)) + 1e-8)
            return img + lr * grad

        return jax.lax.fori_loop(0, steps, body, image)

    rng = np.random.RandomState(0)
    tiles = []
    for fi in range(num_filters):
        img = jnp.asarray(
            rng.uniform(-0.125, 0.125, size=(1, image_size, image_size, 3))
            .astype(np.float32)
        )
        out = np.asarray(ascend(img, fi))[0]
        # normalize to displayable range (reference deprocess step)
        out = (out - out.mean()) / (out.std() + 1e-8) * 0.15 + 0.5
        tiles.append((np.clip(out, 0, 1) * 255).astype(np.uint8))

    cols = int(np.ceil(np.sqrt(num_filters)))
    rows = int(np.ceil(num_filters / cols))
    grid = np.zeros((rows * image_size, cols * image_size, 3), np.uint8)
    for i, tile in enumerate(tiles):
        r, c = divmod(i, cols)
        grid[r * image_size:(r + 1) * image_size,
             c * image_size:(c + 1) * image_size] = tile
    Image.fromarray(grid).save(out_path)
    print(f"saved {num_filters}-filter visualization to {out_path}")
    return out_path


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_type", default="mobilenetv2_lite")
    p.add_argument("--weights_path", default=None)
    p.add_argument("--layer", required=True,
                   help="substring of the intermediate path, e.g. 'Conv'")
    p.add_argument("--num_filters", type=int, default=16)
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--output", default="kernel_viz.png")
    from deeplabv3p_tpu.utils.device import add_device_arg, apply_device_arg

    add_device_arg(p)
    args = p.parse_args()
    apply_device_arg(args)
    visualize_kernels(
        args.model_type, args.weights_path, args.layer, args.num_filters,
        args.image_size, args.steps, out_path=args.output,
    )


if __name__ == "__main__":
    main()
