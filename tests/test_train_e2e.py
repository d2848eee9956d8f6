"""End-to-end training smoke test on the virtual 8-device CPU mesh.

Exercises: synthetic dataset on disk → host loader → device augmentation →
sharded two-stage training (freeze then unfreeze, reference
train.py:172-244) → streaming eval. This doubles as the multi-device
data-parallel test (SURVEY.md §4: simulated mesh stands in for TPU).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from deeplabv3p_tpu.data.augment import AugmentConfig, augment_batch
from deeplabv3p_tpu.data.pipeline import SegmentationDataset
from deeplabv3p_tpu.losses import get_loss_fn
from deeplabv3p_tpu.models.factory import build_deeplab_model
from deeplabv3p_tpu.parallel.mesh import make_mesh
from deeplabv3p_tpu.train import StageConfig, Trainer

NUM_CLASSES = 4
HW = 32
N_IMAGES = 8


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("segds")
    os.makedirs(root / "images")
    os.makedirs(root / "labels")
    rng = np.random.RandomState(0)
    ids = []
    for i in range(N_IMAGES):
        img = rng.randint(0, 255, size=(40, 48, 3), dtype=np.uint8)
        lbl = rng.randint(0, NUM_CLASSES, size=(40, 48), dtype=np.uint8)
        lbl[:4, :4] = 255  # ignore patch
        Image.fromarray(img).save(root / "images" / f"im{i}.jpg")
        Image.fromarray(lbl).save(root / "labels" / f"im{i}.png")
        ids.append(f"im{i}")
    return str(root), ids


def _make_ds(dataset_dir, augment=True):
    root, ids = dataset_dir
    return SegmentationDataset(
        root, ids, batch_size=8, num_classes=NUM_CLASSES,
        input_shape=(HW, HW), augment=augment, num_workers=2,
    )


def test_loader_shapes(dataset_dir):
    ds = _make_ds(dataset_dir)
    images, labels, orig = next(iter(ds.epoch_batches()))
    assert images.shape == (8, HW, HW, 3) and images.dtype == np.uint8
    assert labels.shape == (8, HW, HW)
    assert orig.shape == (8, 2)
    assert (orig == [40.0, 48.0]).all()


def test_two_stage_training_and_eval(dataset_dir):
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    ds = _make_ds(dataset_dir)
    val = _make_ds(dataset_dir, augment=False)

    model = build_deeplab_model(
        "mobilenetv2_lite", NUM_CLASSES, output_stride=16
    )
    loss_fn = get_loss_fn("crossentropy", weighted_type="adaptive")
    trainer = Trainer(
        model, NUM_CLASSES, loss_fn, use_sample_weights=True,
        mesh=make_mesh(8), log_dir="logs/test",
    )

    cfg = AugmentConfig()

    def augment_fn(key, images, labels, orig_hw):
        return augment_batch(
            key, jnp.asarray(images), jnp.asarray(labels),
            jnp.asarray(orig_hw), cfg, num_classes=NUM_CLASSES,
        )

    stages = [
        StageConfig(freeze_level=1, optim_type="adam", learning_rate=1e-3,
                    epochs=1),
        StageConfig(freeze_level=0, optim_type="sgd", learning_rate=1e-3,
                    decay_type="cosine", decay_steps=10, epochs=1),
    ]
    state = trainer.fit(ds, stages, augment_fn=augment_fn)

    assert len(trainer.history) == 2
    for rec in trainer.history:
        assert np.isfinite(rec["loss"])
        assert rec["steps"] == 1

    m = trainer.evaluate(state, val)
    assert 0.0 <= m.miou <= 1.0
    assert 0.0 <= m.pixel_acc <= 1.0
    assert m.iou.shape == (NUM_CLASSES,)


def test_frozen_backbone_params_unchanged(dataset_dir):
    ds = _make_ds(dataset_dir, augment=False)
    model = build_deeplab_model("mobilenetv2_lite", NUM_CLASSES)
    loss_fn = get_loss_fn("crossentropy")
    trainer = Trainer(model, NUM_CLASSES, loss_fn, mesh=make_mesh(8))

    stage = StageConfig(freeze_level=1, optim_type="sgd", learning_rate=0.1,
                        epochs=1)
    state0, tx = trainer.init_state((HW, HW), stage, batch_size=8)
    before = jax.tree_util.tree_map(np.array, state0.params["backbone"])
    # run one explicit step from state0 to compare params precisely
    state1, tx = trainer.build_stage_state(
        state0.params, state0.batch_stats, stage
    )
    train_step = trainer.compile_train_step(tx, stage)
    batch = next(iter(ds.epoch_batches()))
    from deeplabv3p_tpu.data.augment import preprocess_eval_batch
    images, labels = preprocess_eval_batch(
        jnp.asarray(batch[0]), jnp.asarray(batch[1]), num_classes=NUM_CLASSES
    )
    from deeplabv3p_tpu.parallel.mesh import shard_batch
    weights = jnp.ones(labels.shape, jnp.float32)
    images, labels, weights = shard_batch(trainer.mesh, (images, labels, weights))
    # snapshot before stepping: the train step donates its input state
    head_before = np.asarray(state0.params["conv_upsample"]["kernel"])
    state1, _ = train_step(state1, images, labels, weights, 1.0)

    after = state1.params["backbone"]
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(before)[0],
        jax.tree_util.tree_flatten_with_path(after)[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # head must have moved
    head_after = np.asarray(state1.params["conv_upsample"]["kernel"])
    assert not np.allclose(head_before, head_after)


def test_eval_remainder_not_dropped(dataset_dir):
    """With drop_remainder=False the final partial batch is padded with
    ignore labels — every real sample contributes to eval (the reference
    avoids the issue by batch=1 eval, eval.py:380-386)."""
    root, ids = dataset_dir  # 8 samples
    ds = SegmentationDataset(
        root, ids, batch_size=3, num_classes=NUM_CLASSES,
        input_shape=(HW, HW), augment=False, shuffle=False,
        drop_remainder=False, num_workers=2,
    )
    assert len(ds) == 3  # ceil(8 / 3)
    batches = list(ds.epoch_batches())
    assert len(batches) == 3
    images, labels, orig = batches[-1]
    assert images.shape[0] == 3
    # padded entries carry ignore labels only
    assert (labels[2] == 255).all()
    assert not (labels[1] == 255).all()
