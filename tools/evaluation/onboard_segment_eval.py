#!/usr/bin/env python3
"""Offline PNG-vs-PNG segmentation scorer — no model needed.

Port of the reference's on-board eval scorer
(/root/reference/tools/evaluation/onboard/semantic_segment_eval.py:179-274):
loads predicted mask PNGs (produced by the native CLI via
inference/eval_inference.sh) and ground-truth label PNGs, accumulates the
confusion matrix, and reports the same metric suite as eval.py.
"""

import argparse
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from deeplabv3p_tpu.metrics import segment_metrics_from_confusion  # noqa: E402
from deeplabv3p_tpu.ops.resize import resize_nearest  # noqa: E402
from deeplabv3p_tpu.utils.config import get_classes, get_data_list  # noqa: E402


def generate_matrix(gt_mask, pred_mask, num_classes):
    """bincount-trick confusion matrix (reference
    semantic_segment_eval.py:168-176)."""
    valid = (gt_mask >= 0) & (gt_mask < num_classes)
    label = num_classes * gt_mask[valid].astype(int) + pred_mask[valid]
    count = np.bincount(label, minlength=num_classes**2)
    return count.reshape(num_classes, num_classes)


def eval_miou_pngs(dataset, gt_label_path, pred_label_path, class_names,
                   model_output_shape):
    import jax.numpy as jnp

    num_classes = len(class_names)
    cm = np.zeros((num_classes, num_classes), dtype=float)
    for image_id in dataset:
        gt = np.array(Image.open(
            os.path.join(gt_label_path, image_id.strip() + ".png")))
        gt = gt.astype(np.int64)
        gt[gt > (num_classes - 1)] = 255
        if gt.shape != tuple(model_output_shape):
            gt = np.asarray(resize_nearest(
                jnp.asarray(gt), tuple(model_output_shape), convention="cv2"))
        pred = np.array(Image.open(
            os.path.join(pred_label_path, image_id.strip() + ".png")))
        if pred.shape != gt.shape:
            pred = np.asarray(resize_nearest(
                jnp.asarray(pred.astype(np.int64)), gt.shape,
                convention="cv2"))
        cm += generate_matrix(gt, pred.astype(int), num_classes)

    m = segment_metrics_from_confusion(cm)
    print("\nevaluation summary")
    for i, name in enumerate(class_names):
        print(f"{name}: IoU {m.iou[i]:.4f}, Freq {m.freq[i]:.4f}, "
              f"ClassAcc {m.class_acc[i]:.4f}, Dice {m.dice[i]:.4f}")
    print(f"mIoU={m.miou * 100:.3f}")
    print(f"FWIoU={m.fwiou * 100:.3f}")
    print(f"PixelAcc={m.pixel_acc * 100:.3f}")
    print(f"mClassAcc={m.mean_class_acc * 100:.3f}")
    return m


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset_file", required=True)
    p.add_argument("--gt_label_path", required=True)
    p.add_argument("--pred_label_path", required=True)
    p.add_argument("--classes_path", required=True)
    p.add_argument("--model_output_shape", default="512x512")
    from deeplabv3p_tpu.utils.device import add_device_arg, apply_device_arg

    add_device_arg(p)
    args = p.parse_args()
    apply_device_arg(args)

    shape = tuple(int(v) for v in args.model_output_shape.split("x"))
    dataset = get_data_list(args.dataset_file, shuffle=False)
    class_names = get_classes(args.classes_path)
    eval_miou_pngs(dataset, args.gt_label_path, args.pred_label_path,
                   class_names, shape)


if __name__ == "__main__":
    main()
