"""Shape tests for the UNet family and Fast-SCNN
(reference /root/reference/unet/, /root/reference/fast_scnn/)."""

import jax
import jax.numpy as jnp
import pytest

from deeplabv3p_tpu.models.fast_scnn import build_fast_scnn_model
from deeplabv3p_tpu.models.unet import build_unet_model

INPUT = 32
NUM_CLASSES = 6


@pytest.mark.parametrize(
    "model_type", ["unet_standard", "unet_lite", "unet_simple"]
)
def test_unet_logits_shape(model_type):
    model = build_unet_model(model_type, NUM_CLASSES)
    x = jnp.zeros((1, INPUT, INPUT, 3), jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(vars_, x)
    assert logits.shape == (1, INPUT, INPUT, NUM_CLASSES)
    assert logits.dtype == jnp.float32


def test_unet_train_mode():
    model = build_unet_model("unet_simple", NUM_CLASSES)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, INPUT, INPUT, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    logits, updates = model.apply(
        vars_, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert logits.shape == (1, INPUT, INPUT, NUM_CLASSES)
    assert "batch_stats" in updates


FS_INPUT = 256  # PPM bins [2,4,6,8] need the OS32 feature map >= 8px


def test_fast_scnn_logits_shape():
    model = build_fast_scnn_model("fast_scnn", NUM_CLASSES)
    x = jnp.zeros((1, FS_INPUT, FS_INPUT, 3), jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(vars_, x)
    assert logits.shape == (1, FS_INPUT, FS_INPUT, NUM_CLASSES)


def test_fast_scnn_train_dropout_rng():
    model = build_fast_scnn_model("fast_scnn", NUM_CLASSES)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, FS_INPUT, FS_INPUT, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    logits, _ = model.apply(
        vars_, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(3)},
        mutable=["batch_stats"],
    )
    assert logits.shape == (1, FS_INPUT, FS_INPUT, NUM_CLASSES)


def test_unknown_model_raises():
    with pytest.raises(ValueError):
        build_unet_model("nope", 3)
    with pytest.raises(ValueError):
        build_fast_scnn_model("nope", 3)


@pytest.mark.slow
def test_trainer_works_across_families(tmp_path):
    """One Trainer step for UNet and Fast-SCNN — the training engine is
    model-family agnostic (all models emit logits at input resolution)."""
    import numpy as np
    from PIL import Image

    from deeplabv3p_tpu.data.pipeline import SegmentationDataset
    from deeplabv3p_tpu.losses import get_loss_fn
    from deeplabv3p_tpu.parallel.mesh import make_mesh
    from deeplabv3p_tpu.train import StageConfig, Trainer

    import os

    root = tmp_path / "ds"
    os.makedirs(root / "images")
    os.makedirs(root / "labels")
    rng = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray(
            rng.randint(0, 255, size=(40, 40, 3), dtype=np.uint8)
        ).save(root / "images" / f"u{i}.jpg")
        Image.fromarray(
            rng.randint(0, NUM_CLASSES, size=(40, 40), dtype=np.uint8)
        ).save(root / "labels" / f"u{i}.png")
    ds = SegmentationDataset(
        str(root), [f"u{i}" for i in range(4)], batch_size=4,
        num_classes=NUM_CLASSES, input_shape=(32, 32), augment=False,
        num_workers=2,
    )

    for model_type in ("unet_simple", "fast_scnn"):
        from deeplabv3p_tpu.models.factory import build_segmentation_model

        model = build_segmentation_model(model_type, NUM_CLASSES)
        trainer = Trainer(
            model, NUM_CLASSES, get_loss_fn("crossentropy"),
            l2_factor=0.0, mesh=make_mesh(4), log_dir=str(tmp_path / "logs"),
        )
        stage = StageConfig(optim_type="adam", learning_rate=1e-3, epochs=1)
        state = trainer.fit(ds, [stage])
        assert np.isfinite(trainer.history[-1]["loss"]), model_type
        trainer.history.clear()
