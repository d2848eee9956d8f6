"""Full evaluation pipeline (reference /root/reference/eval.py:376-512).

On-device streaming: each batch runs one jitted program
(forward → argmax → confusion-matrix delta); only the final (C, C) matrix
reaches the host. Derived metrics (PixelAcc / mClassAcc / IoU / mIoU /
FWIoU / Dice) and the plots (per-class IOU bar chart, normalized confusion
matrix) reproduce eval.py:461-510 / eval.py:200-346.
"""

from __future__ import annotations

import os
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from deeplabv3p_tpu import metrics as metrics_lib
from deeplabv3p_tpu.data.augment import preprocess_eval_batch
from deeplabv3p_tpu.data.pipeline import SegmentationDataset
from deeplabv3p_tpu.postprocess import crf_postprocess
from deeplabv3p_tpu.utils.visualize import visualize_segmentation


def plot_miou_result(ious: "OrderedDict[str, float]", miou: float, out_dir="result"):
    """Per-class IOU horizontal bar chart (reference plot_mIOU_result,
    eval.py:200-230)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    names = list(ious.keys())
    values = [v * 100 for v in ious.values()]
    plt.figure(figsize=(10, 8))
    plt.barh(np.arange(len(names)), values)
    plt.yticks(np.arange(len(names)), names)
    for i, v in enumerate(values):
        plt.text(v + 1, i, f"{v:.2f}", va="center")
    plt.xlabel("IoU (%)")
    plt.title(f"mIoU = {miou * 100:.2f}%")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "mIOU.png")
    plt.savefig(path, bbox_inches="tight")
    plt.close("all")
    return path


def plot_confusion_matrix(
    cm: np.ndarray, class_names, miou: float, normalize=True, out_dir="result"
):
    """Confusion-matrix PNG (reference plot_confusion_matrix,
    eval.py:233-346)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cm = cm.astype(np.float64)
    if normalize:
        with np.errstate(divide="ignore", invalid="ignore"):
            cm = cm / cm.sum(axis=1, keepdims=True)
        cm = np.nan_to_num(cm)
    plt.figure(figsize=(10, 8))
    plt.imshow(cm, interpolation="nearest", cmap="Blues")
    plt.colorbar()
    ticks = np.arange(len(class_names))
    plt.xticks(ticks, class_names, rotation=90, fontsize=7)
    plt.yticks(ticks, class_names, fontsize=7)
    plt.ylabel("GT")
    plt.xlabel(f"Pred (mIoU {miou * 100:.2f}%)")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "confusion_matrix.png")
    plt.savefig(path, bbox_inches="tight")
    plt.close("all")
    return path


def save_seg_result(image, pred_mask, gt_mask, image_id, class_names, out_dir="result"):
    """Per-image result dump: labelme-compatible PNG label + overlay JPG
    (reference save_seg_result, eval.py:349-365)."""
    label_dir = os.path.join(out_dir, "labels")
    os.makedirs(label_dir, exist_ok=True)
    Image.fromarray(pred_mask.astype(np.uint8)).save(
        os.path.join(label_dir, f"{image_id}.png")
    )
    seg_dir = os.path.join(out_dir, "segmentation")
    os.makedirs(seg_dir, exist_ok=True)
    arr = visualize_segmentation(
        image, pred_mask, gt_mask, class_names=class_names,
        title="Predict Segmentation", gt_title="GT Segmentation",
    )
    Image.fromarray(arr).save(os.path.join(seg_dir, f"{image_id}.jpg"))


def eval_miou(
    model,
    variables,
    dataset_path: str,
    data_list: list[str],
    class_names: list[str],
    model_input_shape=(512, 512),
    batch_size: int = 8,
    do_crf: bool = False,
    save_result: bool = False,
    plots: bool = False,
    out_dir: str = "result",
) -> metrics_lib.SegmentMetrics:
    """Evaluate a model over a dataset; prints the reference's summary and
    returns the metric suite (reference eval_mIOU, eval.py:376-512).

    Unlike the reference's batch-1 host loop, batches stream through one
    jitted device program; CRF/result-saving fall back to per-image host
    work only when requested.
    """
    num_classes = len(class_names)
    ds = SegmentationDataset(
        dataset_path, data_list, batch_size=batch_size,
        num_classes=num_classes, input_shape=model_input_shape,
        augment=False, shuffle=False, drop_remainder=False,
    )

    def predict_masks(images):
        logits = model.apply(variables, images, train=False)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    # pseudo-models running host-side engines (e.g. the ONNX numpy
    # interpreter) set jittable=False and run eagerly
    jittable = getattr(model, "jittable", True)
    if jittable:
        predict_masks = jax.jit(predict_masks)

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")

    @jax.jit
    def fused_eval_step(cm, images_u8, labels_u8):
        """ONE dispatch per batch: normalize + forward + argmax +
        confusion delta + accumulate — logits/masks never leave the
        device (reference hot loop eval.py:403-459 runs per-image on
        host). On TPU the confusion matrix is the one-hot MATMUL form
        (MXU) rather than bincount (serialized scatter)."""
        images, labels = preprocess_eval_batch(
            images_u8, labels_u8, num_classes=num_classes
        )
        preds = predict_masks(images)
        cm_fn = (
            metrics_lib.confusion_matrix_matmul
            if on_tpu else metrics_lib.confusion_matrix
        )
        return cm + cm_fn(labels, preds, num_classes)

    @jax.jit
    def cm_update(cm, pred, labels):
        return cm + metrics_lib.confusion_matrix(labels, pred, num_classes)

    cm = jnp.zeros((num_classes, num_classes), jnp.int32)
    sample_idx = 0
    if jittable and not (do_crf or save_result):
        # fast path: stream batches through the fused program
        for images_u8, labels_u8, _ in ds.epoch_batches():
            cm = fused_eval_step(
                cm, jnp.asarray(images_u8), jnp.asarray(labels_u8)
            )
        cm_host = np.asarray(cm)
        return _finish_eval(cm_host, class_names, plots, out_dir)
    for images_u8, labels_u8, _ in ds.epoch_batches():
        images, labels = preprocess_eval_batch(
            jnp.asarray(images_u8), jnp.asarray(labels_u8),
            num_classes=num_classes,
        )
        preds = predict_masks(images)
        if do_crf or save_result:
            preds_np = np.asarray(preds)
            for b in range(preds_np.shape[0]):
                if sample_idx + b >= ds.num_samples:
                    break  # final-batch padding
                pred_mask = preds_np[b]
                if do_crf:
                    pred_mask = crf_postprocess(images_u8[b], pred_mask)
                    preds_np[b] = pred_mask
                if save_result:
                    image_id = os.path.splitext(
                        os.path.basename(ds.image_paths[sample_idx + b])
                    )[0]
                    save_seg_result(
                        images_u8[b], pred_mask,
                        np.asarray(labels[b]), image_id, class_names, out_dir,
                    )
            preds = jnp.asarray(preds_np)
        cm = cm_update(cm, preds, labels)
        sample_idx += images_u8.shape[0]

    return _finish_eval(np.asarray(cm), class_names, plots, out_dir)


def _finish_eval(cm_host, class_names, plots, out_dir):
    """Metric derivation + the reference's summary report + plots
    (eval.py:461-510)."""
    m = metrics_lib.segment_metrics_from_confusion(cm_host)

    # per-class report sorted by IoU descending (reference eval.py:487-506)
    ious = OrderedDict(
        sorted(
            zip(class_names, m.iou), key=lambda kv: kv[1], reverse=True
        )
    )
    print("\nevaluation summary")
    for i, name in enumerate(class_names):
        print(
            f"{name}: IoU {m.iou[i]:.4f}, Freq {m.freq[i]:.4f}, "
            f"ClassAcc {m.class_acc[i]:.4f}, Dice {m.dice[i]:.4f}"
        )
    print(f"mIoU={m.miou * 100:.3f}")
    print(f"FWIoU={m.fwiou * 100:.3f}")
    print(f"PixelAcc={m.pixel_acc * 100:.3f}")
    print(f"mClassAcc={m.mean_class_acc * 100:.3f}")

    if plots:
        plot_miou_result(ious, m.miou, out_dir)
        plot_confusion_matrix(cm_host, class_names, m.miou, True, out_dir)
    return m
