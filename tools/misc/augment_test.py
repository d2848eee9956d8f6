#!/usr/bin/env python3
"""Augmentation eyeball tool: dump augmented image/label pairs.

Port of /root/reference/tools/misc/augment_test.py:17-50, driving the
device-side augmentation graph instead of the CPU op chain: loads one
image+label pair, runs `augment_batch` N times with different seeds, and
saves the augmented images and color-mapped labels side by side.
"""

import argparse
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image_file", required=True)
    p.add_argument("--label_file", required=True)
    p.add_argument("--output_path", default="augment_samples")
    p.add_argument("--input_shape", type=int, default=512)
    p.add_argument("--count", type=int, default=8)
    p.add_argument("--num_classes", type=int, default=21)
    from deeplabv3p_tpu.utils.device import add_device_arg, apply_device_arg

    add_device_arg(p)
    args = p.parse_args()
    apply_device_arg(args)  # spawned CLIs must honor --device cpu

    import jax
    import jax.numpy as jnp

    from deeplabv3p_tpu.data.augment import AugmentConfig, augment_batch
    from deeplabv3p_tpu.data.pipeline import _resize_pair
    from deeplabv3p_tpu.utils.visualize import label_to_color_image

    image = np.array(Image.open(args.image_file).convert("RGB"))
    label = np.array(Image.open(args.label_file))
    if label.ndim == 3:
        label = label[..., 0]
    orig_hw = np.array(image.shape[:2], np.float32)
    shape = (args.input_shape, args.input_shape)
    image, label = _resize_pair(image, label.astype(np.uint8), shape)

    os.makedirs(args.output_path, exist_ok=True)
    cfg = AugmentConfig()
    for i in range(args.count):
        imgs, lbls, _ = augment_batch(
            jax.random.PRNGKey(i),
            jnp.asarray(image[None]),
            jnp.asarray(label[None]),
            jnp.asarray(orig_hw[None]),
            cfg, num_classes=args.num_classes,
        )
        out_img = ((np.asarray(imgs[0]) + 1.0) * 127.5).clip(0, 255)
        lbl_np = np.asarray(lbls[0]).copy()
        lbl_np[lbl_np > args.num_classes - 1] = args.num_classes
        color = label_to_color_image(lbl_np).astype(np.uint8)
        side = np.concatenate([out_img.astype(np.uint8), color], axis=1)
        Image.fromarray(side).save(
            os.path.join(args.output_path, f"augment_{i}.jpg")
        )
    print(f"saved {args.count} augmented samples to {args.output_path}")


if __name__ == "__main__":
    main()
