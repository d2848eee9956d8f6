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
