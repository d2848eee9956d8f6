#!/usr/bin/env python3
"""Training CLI — TPU-native counterpart of /root/reference/train.py.

Two-stage transfer training: a frozen-backbone stage with an undecayed
optimizer (reference train.py:98-105,172-187), then unfreeze-all with a
rebuilt decayed/averaged optimizer (train.py:192-244). Data parallelism is
a device mesh (`--num_devices` replaces `--gpu_num`).

Example:
  python train.py --model_type=mobilenetv3large_lite \
      --dataset_path=VOC2012 --dataset_file=VOC2012/train.txt \
      --val_dataset_file=VOC2012/val.txt --classes_path=configs/voc_classes.txt \
      --loss=focal --weighted_type=adaptive --decay_type=cosine
"""

import argparse
import os

import jax.numpy as jnp

from deeplabv3p_tpu.data.augment import AugmentConfig, augment_batch
from deeplabv3p_tpu.data.pipeline import SegmentationDataset
from deeplabv3p_tpu.losses import get_loss_fn
from deeplabv3p_tpu.models.factory import build_segmentation_model
from deeplabv3p_tpu.parallel.mesh import make_mesh
from deeplabv3p_tpu.train import StageConfig, Trainer
from deeplabv3p_tpu.utils.checkpoint import CheckpointManager
from deeplabv3p_tpu.utils.config import (
    get_classes,
    get_data_list,
    load_class_weights,
)


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
        import jax

        jax.config.update("jax_platforms", "cpu")
    from deeplabv3p_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()  # big XLA compiles become one-time per rig
    class_names = get_classes(args.classes_path)
    num_classes = len(class_names)
    assert num_classes < 254, "PNG label only supports < 254 classes"
    input_shape = parse_input_shape(args.model_input_shape)

    from deeplabv3p_tpu.data.shards import ShardedDataset, is_packed_dataset

    if is_packed_dataset(args.dataset_path):
        # pre-decoded shard dir (tools/dataset_converter/pack_dataset.py):
        # epochs stream mmap'd uint8 — no per-step JPEG decode
        train_ds = ShardedDataset(
            args.dataset_path, batch_size=args.batch_size,
        )
        if tuple(train_ds.input_shape) != tuple(input_shape):
            raise SystemExit(
                f"packed dataset resolution {train_ds.input_shape} != "
                f"--model_input_shape {input_shape}; re-pack or adjust"
            )
        train_list = train_ds.ids
    else:
        train_list = get_data_list(args.dataset_file)
        train_ds = SegmentationDataset(
            args.dataset_path, train_list, batch_size=args.batch_size,
            num_classes=num_classes, input_shape=input_shape,
            augment=args.augment,
        )

    val_ds = None
    if args.val_dataset_file and is_packed_dataset(args.val_dataset_file):
        val_ds = ShardedDataset(
            args.val_dataset_file, batch_size=args.batch_size,
            shuffle=False, drop_remainder=False,
        )
    elif args.val_dataset_file:
        val_list = get_data_list(args.val_dataset_file)
        if val_list:
            val_ds = SegmentationDataset(
                args.dataset_path, val_list, batch_size=args.batch_size,
                num_classes=num_classes, input_shape=input_shape,
                augment=False, shuffle=False, drop_remainder=False,
            )

    class_weights = None
    if args.weighted_type == "balanced":
        # static dataset-level class weights: load the cached file or
        # compute + save it (reference calculate_weigths_labels flow,
        # common/utils.py:92-126; train.py loads via load_class_weights)
        wpath = os.path.join(args.dataset_path, "classes_weights.txt")
        if os.path.exists(wpath):
            class_weights = load_class_weights(wpath)
        else:
            from deeplabv3p_tpu.utils.config import calculate_weights_labels

            print("computing balanced class weights over the dataset ...")
            if is_packed_dataset(args.dataset_path):
                stat_ds = ShardedDataset(
                    args.dataset_path, batch_size=args.batch_size,
                    shuffle=False,
                )
            else:
                stat_ds = SegmentationDataset(
                    args.dataset_path, train_list,
                    batch_size=args.batch_size, num_classes=num_classes,
                    input_shape=input_shape, augment=False, shuffle=False,
                )
            class_weights = calculate_weights_labels(
                stat_ds, num_classes, save_path=wpath
            )
    loss_fn = get_loss_fn(
        args.loss, weighted_type=args.weighted_type, class_weights=class_weights
    )

    model = build_segmentation_model(
        args.model_type, num_classes, output_stride=args.output_stride,
        remat=args.remat,
        dtype=jnp.bfloat16 if args.mixed_precision else None,
    )
    if args.spatial_partition > 1:
        n = args.num_devices if args.num_devices > 0 else None
        import jax as _jax

        total = n if n is not None else len(_jax.devices())
        if total % args.spatial_partition:
            raise SystemExit(
                f"--spatial_partition {args.spatial_partition} must divide "
                f"the device count ({total})"
            )
        mesh = make_mesh(
            n, axis_names=("data", "spatial"),
            mesh_shape=(total // args.spatial_partition,
                        args.spatial_partition),
        )
    else:
        mesh = make_mesh(args.num_devices if args.num_devices > 0 else None)
    if args.device_cache:
        # whole-dataset-in-HBM feeder: upload once, gather batches
        # on-device — per-step host traffic drops to B int32 indices
        # (data/device_cache.py; the tunnel/decode ceiling disappears)
        from deeplabv3p_tpu.data.device_cache import DeviceCachedDataset

        print("caching the train set into device memory ...")
        train_ds = DeviceCachedDataset.from_source(train_ds, mesh=mesh)

    if args.fused_loss:
        # the Pallas loss tail implements (class-weighted) CE + ignore
        # semantics for DeepLab conv-head models; multi-device data-parallel
        # meshes shard_map it per device (spatial partitioning gated out)
        from deeplabv3p_tpu.models.factory import DEEPLAB_MODEL_REGISTRY

        if args.loss != "crossentropy":
            raise SystemExit("--fused_loss supports --loss crossentropy only")
        if args.model_type not in DEEPLAB_MODEL_REGISTRY:
            raise SystemExit(
                "--fused_loss requires a DeepLab conv-head model"
            )
        if args.spatial_partition > 1:
            raise SystemExit(
                "--fused_loss supports data-parallel meshes only "
                "(--spatial_partition 1); the in-kernel upsample would "
                "need a halo exchange under an H-split"
            )

    trainer = Trainer(
        model, num_classes, loss_fn,
        use_sample_weights=(args.weighted_type == "adaptive"),
        # UNet family carries no conv regularizers in the reference
        l2_factor=0.0 if args.model_type.startswith("unet") else 2e-5,
        mesh=mesh, log_dir=args.log_dir,
        fused_loss=args.fused_loss,
        fused_class_weights=(
            class_weights if args.weighted_type == "balanced" else None
        ),
    )

    steps_per_epoch = max(1, len(train_ds))
    total_steps = steps_per_epoch * max(
        args.total_epoch - args.transfer_epoch, 1
    )
    stages = []
    if args.transfer_epoch > args.init_epoch:
        stages.append(
            StageConfig(
                freeze_level=args.freeze_level,
                optim_type=args.optimizer, learning_rate=args.learning_rate,
                decay_type=None, epochs=args.transfer_epoch - args.init_epoch,
                grad_accum=args.grad_accum,
                state_dtype=args.optim_state_dtype,
            )
        )
    stages.append(
        StageConfig(
            freeze_level=0, optim_type=args.optimizer,
            learning_rate=args.learning_rate, decay_type=args.decay_type,
            decay_steps=max(total_steps // args.grad_accum, 1),
            average_type=args.weights_average_type,
            epochs=args.total_epoch - max(args.transfer_epoch, args.init_epoch),
            grad_accum=args.grad_accum,
            state_dtype=args.optim_state_dtype,
        )
    )

    ckpt = CheckpointManager(args.log_dir)
    # --no_augment keeps the fused device preprocessing (normalize +
    # adaptive weights) but disables every stochastic op — deterministic
    # training for overfit/convergence checks
    aug_cfg = AugmentConfig() if args.augment else AugmentConfig.identity()

    def augment_fn(key, images, labels, orig_hw):
        return augment_batch(
            key, jnp.asarray(images), jnp.asarray(labels),
            jnp.asarray(orig_hw), aug_cfg, num_classes=num_classes,
        )

    initial_variables = None
    if args.weights_path:
        if args.weights_path.endswith(".h5"):
            import jax

            from deeplabv3p_tpu.utils.keras_import import load_keras_h5_weights

            x = jnp.zeros((1, *input_shape, 3), jnp.float32)
            initial_variables = jax.jit(model.init)(
                jax.random.PRNGKey(0), x
            )
            initial_variables = load_keras_h5_weights(
                args.weights_path, initial_variables
            )
        else:
            from deeplabv3p_tpu.utils.checkpoint import load_variables

            initial_variables = load_variables(args.weights_path)

    state = trainer.fit(
        train_ds, stages, augment_fn=augment_fn, val_data=val_ds,
        eval_data=val_ds if args.eval_online else None,
        eval_every=args.eval_epoch_interval if args.eval_online else 0,
        ckpt_manager=ckpt,
        initial_variables=initial_variables,
    )
    final = {"params": state.params, "batch_stats": state.batch_stats}
    if args.bn_recalibrate:
        # exact BN statistics over the (un-augmented) train set — needed
        # when the run is short vs the BN EMA horizon (momentum 0.999 ≈
        # 1k steps); the tfa-SWA 'update BN stats' finalization
        from deeplabv3p_tpu.train import recalibrate_batch_stats

        if is_packed_dataset(args.dataset_path):
            recal_ds = ShardedDataset(
                args.dataset_path, batch_size=args.batch_size,
                shuffle=False,
            )
        else:
            recal_ds = SegmentationDataset(
                args.dataset_path, train_list, batch_size=args.batch_size,
                num_classes=num_classes, input_shape=input_shape,
                augment=False, shuffle=False,
            )
        print("recalibrating BN statistics over the train set ...")
        final = recalibrate_batch_stats(
            model, final, recal_ds.epoch_batches(), num_classes
        )
    path = ckpt.save_final(final)
    print(f"saved final model to {path}")
    for rec in trainer.history:
        print(rec)


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    # model (reference train.py:253-266)
    p.add_argument("--model_type", default="mobilenetv3large_lite")
    p.add_argument("--model_input_shape", default="512x512",
                   help="HxW (e.g. 512x512 or 1024x512) or a single int")
    p.add_argument("--output_stride", type=int, default=16, choices=[8, 16, 32])
    p.add_argument("--weights_path", default=None)
    # data
    p.add_argument("--dataset_path", default="VOC2012/")
    p.add_argument("--dataset_file", default="VOC2012/train.txt")
    p.add_argument("--val_dataset_file", default=None)
    p.add_argument("--classes_path", default="configs/voc_classes.txt")
    # training (reference train.py:268-315)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--optimizer", default="sgd",
                   choices=["adam", "rmsprop", "sgd"])
    p.add_argument("--optim_state_dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="storage dtype for the optimizer momentum state; "
                        "bfloat16 halves its HBM traffic (HBM-roofline "
                        "lever for bandwidth-bound steps; sgd/adam only)")
    p.add_argument("--learning_rate", type=float, default=1e-2)
    p.add_argument("--decay_type", default="cosine",
                   choices=["none", "cosine", "exponential", "polynomial",
                            "piecewise_constant"])
    p.add_argument("--weights_average_type", default=None,
                   choices=[None, "ema", "swa", "lookahead"])
    p.add_argument("--loss", default="crossentropy",
                   choices=["crossentropy", "focal"])
    p.add_argument("--weighted_type", default=None,
                   choices=[None, "adaptive", "balanced"])
    p.add_argument("--init_epoch", type=int, default=0)
    p.add_argument("--transfer_epoch", type=int, default=10)
    p.add_argument("--total_epoch", type=int, default=150)
    p.add_argument("--freeze_level", type=int, default=1, choices=[0, 1, 2])
    p.add_argument("--eval_online", action="store_true",
                   help="periodic full-mIOU eval (reference --eval_online)")
    p.add_argument("--eval_epoch_interval", type=int, default=10)
    p.add_argument("--num_devices", type=int, default=0,
                   help="devices in the data mesh (0 = all)")
    p.add_argument("--spatial_partition", type=int, default=1,
                   help="shard image height over this many devices per "
                        "data-parallel group (2-D data x spatial mesh; "
                        "image H must divide by it)")
    p.add_argument("--bn_recalibrate", action="store_true",
                   help="replace BN running stats with exact train-set "
                        "statistics before the final save (use for short "
                        "runs or with --weights_average_type swa)")
    p.add_argument("--device_cache", action="store_true",
                   help="cache the whole train set in device memory and "
                        "gather batches on-device (fits-in-HBM datasets; "
                        "removes the host decode/transfer ceiling)")
    p.add_argument("--augment", dest="augment", action="store_true",
                   default=True)
    p.add_argument("--no_augment", dest="augment", action="store_false",
                   help="disable the stochastic augmentation ops "
                        "(normalization/adaptive weights still apply)")
    p.add_argument("--mixed_precision", action="store_true", default=True)
    p.add_argument("--fused_loss", action="store_true",
                   help="fuse upsample+CE+metric into one Pallas kernel "
                        "(DeepLab conv-head models, CE loss, data-parallel meshes)")
    p.add_argument("--remat", nargs="?", const="full", default="off",
                   choices=["off", "full", "block"],
                   help="rematerialize backbone activations (OS8 memory): "
                        "'full' = one checkpoint around the backbone "
                        "(bare --remat), 'block' = per-block checkpoints "
                        "(mobilenetv2/xception/resnet50 backbones)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="accumulate gradients over k micro-batches before "
                        "each optimizer update (effective batch = "
                        "k * batch_size without the activation memory)")
    p.add_argument("--log_dir", default="logs/000")
    p.add_argument("--device", default="auto", choices=["auto", "cpu"],
                   help="force the CPU backend (e.g. virtual-mesh tests)")
    return p.parse_args()


if __name__ == "__main__":
    main(parse_args())
