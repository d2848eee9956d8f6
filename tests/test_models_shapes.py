"""Shape & output-stride tests for the DeepLab model zoo.

Validates the OS→(stride, dilation) machinery produces the feature-map
resolutions documented in SURVEY.md §3.4 and that logits come back at input
resolution for every registered model type.
"""

import jax
import jax.numpy as jnp
import pytest

from deeplabv3p_tpu.models.factory import (
    DEEPLAB_MODEL_REGISTRY,
    build_deeplab_model,
)
from deeplabv3p_tpu.models.mobilenetv2 import MobileNetV2Body, make_divisible

INPUT = 64  # small, CPU-friendly; divisible by 32


def test_make_divisible():
    # reference deeplabv3p_mobilenetv2.py:28-35 semantics
    assert make_divisible(32 * 1.0, 8) == 32
    assert make_divisible(32 * 0.35, 8) == 16
    assert make_divisible(10, 8) == 16  # 8 < 0.9*10 -> bumped


@pytest.mark.parametrize("output_stride", [8, 16, 32])
def test_mobilenetv2_body_output_stride(output_stride):
    body = MobileNetV2Body(output_stride=output_stride)
    x = jax.ShapeDtypeStruct((1, INPUT, INPUT, 3), jnp.float32)
    vars_ = jax.eval_shape(body.init, jax.random.PRNGKey(0), x)
    feat, skip = jax.eval_shape(lambda v, im: body.apply(v, im), vars_, x)
    assert feat.shape[1] == INPUT // output_stride
    assert feat.shape[2] == INPUT // output_stride
    assert feat.shape[3] == 320
    # skip feature is OS4 (reference deeplabv3p_mobilenetv2.py:116-117)
    assert skip.shape[1] == INPUT // 4
    assert skip.shape[3] == 24


@pytest.mark.parametrize("model_type", sorted(DEEPLAB_MODEL_REGISTRY))
def test_deeplab_logits_shape(model_type):
    """Shape-only sweep over all 17 variants via eval_shape (no compute —
    the whole registry checks in seconds). Numeric execution is covered
    by test_deeplab_numeric_representatives."""
    num_classes = 7
    small = 32
    model = build_deeplab_model(model_type, num_classes, output_stride=16)
    x = jax.ShapeDtypeStruct((1, small, small, 3), jnp.float32)
    vars_ = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    logits = jax.eval_shape(
        lambda v, im: model.apply(v, im), vars_, x
    )
    assert logits.shape == (1, small, small, num_classes)
    assert logits.dtype == jnp.float32


@pytest.mark.parametrize(
    "model_type", ["mobilenetv2", "xception", "ghostnet_lite", "mobilevit_xxs"]
)
@pytest.mark.slow
def test_deeplab_numeric_representatives(model_type):
    """Real execution for one representative of each structural family
    (OS32 keeps the CPU compiles small)."""
    model = build_deeplab_model(model_type, 5, output_stride=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(vars_, x)
    assert logits.shape == (1, 32, 32, 5)
    assert bool(jnp.isfinite(logits).all())


# expected (feature_channels, skip_channels, skip_os) per backbone
_BODY_SPECS = {
    "xception": ("deeplabv3p_tpu.models.xception", "XceptionBody", 2048, 256),
    "resnet50": ("deeplabv3p_tpu.models.resnet50", "ResNet50Body", 2048, 256),
    "mobilenetv3large": (
        "deeplabv3p_tpu.models.mobilenetv3", "MobileNetV3LargeBody", 160, 24
    ),
    "mobilenetv3small": (
        "deeplabv3p_tpu.models.mobilenetv3", "MobileNetV3SmallBody", 96, 16
    ),
    "peleenet": ("deeplabv3p_tpu.models.peleenet", "PeleeNetBody", 704, 128),
    "ghostnet": ("deeplabv3p_tpu.models.ghostnet", "GhostNetBody", 960, 24),
    "mobilevit_s": ("deeplabv3p_tpu.models.mobilevit", "MobileViTBody", 640, 64),
}


@pytest.mark.parametrize("name", sorted(_BODY_SPECS))
@pytest.mark.parametrize("output_stride", [8, 16, 32])
def test_backbone_body_os(name, output_stride):
    """OS table shape checks via eval_shape (no compute)."""
    import importlib

    mod_name, cls_name, feat_ch, skip_ch = _BODY_SPECS[name]
    body = getattr(importlib.import_module(mod_name), cls_name)(
        output_stride=output_stride
    )
    x = jax.ShapeDtypeStruct((1, INPUT, INPUT, 3), jnp.float32)
    vars_ = jax.eval_shape(body.init, jax.random.PRNGKey(0), x)
    feat, skip = jax.eval_shape(lambda v, im: body.apply(v, im), vars_, x)
    assert feat.shape[1:3] == (INPUT // output_stride, INPUT // output_stride)
    assert feat.shape[3] == feat_ch
    assert skip.shape[1] == INPUT // 4
    assert skip.shape[3] == skip_ch


@pytest.mark.slow
def test_deeplab_train_mode_updates_batch_stats():
    model = build_deeplab_model("mobilenetv2_lite", 5, output_stride=16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, INPUT, INPUT, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    logits, updates = model.apply(
        vars_, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert logits.shape == (2, INPUT, INPUT, 5)
    # batch stats must actually move
    old = jax.tree_util.tree_leaves(vars_["batch_stats"])
    new = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(
        not jnp.allclose(o, n) for o, n in zip(old, new)
    ), "train=True must update running statistics"


def test_subpixel_head_shape():
    model = build_deeplab_model(
        "mobilenetv2_lite", 3, output_stride=16, use_subpixel=True
    )
    x = jnp.zeros((1, INPUT, INPUT, 3), jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(vars_, x)
    assert logits.shape == (1, INPUT, INPUT, 3)


def test_freeze_mask_levels():
    from deeplabv3p_tpu.models.factory import make_trainable_mask

    model = build_deeplab_model("mobilenetv2_lite", 3)
    x = jnp.zeros((1, INPUT, INPUT, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    m0 = make_trainable_mask(params, 0)
    assert all(jax.tree_util.tree_leaves(m0))

    m1 = make_trainable_mask(params, 1)
    assert not any(jax.tree_util.tree_leaves(m1["backbone"]))
    assert all(jax.tree_util.tree_leaves(m1["conv_upsample"]))
    assert all(jax.tree_util.tree_leaves(m1["aspp"]))

    m2 = make_trainable_mask(params, 2)
    assert not any(jax.tree_util.tree_leaves(m2["backbone"]))
    assert not any(jax.tree_util.tree_leaves(m2["aspp"]))
    assert all(jax.tree_util.tree_leaves(m2["conv_upsample"]))


def test_icnr_subpixel_blocks_identical():
    """ICNR-initialized Subpixel must emit identical r x r output blocks
    at init (checkerboard-free property, reference layers.py:227-253)."""
    from deeplabv3p_tpu.models.layers import Subpixel

    m = Subpixel(filters=3, kernel_size=1, r=2, use_icnr=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 16))
    vars_ = m.init(jax.random.PRNGKey(1), x)
    y = m.apply(vars_, x)
    assert y.shape == (1, 16, 16, 3)
    blocks = y.reshape(1, 8, 2, 8, 2, 3)
    import numpy as np
    ref = blocks[:, :, :1, :, :1, :]
    np.testing.assert_allclose(
        np.asarray(blocks), np.broadcast_to(np.asarray(ref), blocks.shape),
        rtol=1e-5, atol=1e-6,
    )


def _make_stub_body():
    """Tiny two-conv backbone exercising the factory's remat wiring
    without a full MobileNet compile (keeps this test ~10x faster)."""
    import flax.linen as nn

    from deeplabv3p_tpu.models.layers import BatchNorm, _conv

    class StubBody(nn.Module):
        output_stride: int = 32
        dtype: object = None

        @nn.compact
        def __call__(self, x, train=False):
            x = _conv(8, 3, strides=4, name="c0", dtype=self.dtype)(x)
            x = BatchNorm(dtype=self.dtype, name="c0_BN")(x, train=train)
            skip = x
            s = self.output_stride // 4
            x = _conv(16, 3, strides=s, name="c1", dtype=self.dtype)(x)
            return x, skip

    return StubBody


@pytest.mark.slow
def test_remat_matches_plain_gradients():
    """Backbone rematerialization must not change math — grads identical
    (SURVEY.md §7 OS8 memory hard part)."""
    import numpy as np

    from deeplabv3p_tpu.models.factory import DeeplabV3Plus

    stub = _make_stub_body()
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 32, 32, 3))
    grads = []
    for remat in (False, True):
        model = DeeplabV3Plus(
            backbone_fn=stub, num_classes=4, output_stride=32, lite=True,
            remat=remat,
        )
        vars_ = model.init(jax.random.PRNGKey(0), x)

        def loss(p):
            logits, _ = model.apply(
                {"params": p, "batch_stats": vars_["batch_stats"]}, x,
                train=True, rngs={"dropout": jax.random.PRNGKey(1)},
                mutable=["batch_stats"],
            )
            return jnp.mean(logits**2)

        grads.append(jax.grad(loss)(vars_["params"]))
    for a, b in zip(
        jax.tree_util.tree_leaves(grads[0]), jax.tree_util.tree_leaves(grads[1])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize(
    "model_type", ["mobilenetv2_lite", "xception", "resnet50"]
)
def test_remat_block_matches_plain_gradients(model_type):
    """Per-block remat (remat='block': jax.checkpoint around every
    backbone block) must not change math — grads of the real model
    identical to the non-remat model, and the param tree (scopes/names)
    unchanged so checkpoints interchange. Covers every family exposing
    `remat_blocks` (mobilenetv2/xception/resnet50 bodies)."""
    import numpy as np

    from deeplabv3p_tpu.models.factory import build_deeplab_model

    x = jax.random.normal(jax.random.PRNGKey(5), (1, 32, 32, 3))
    grads, treedefs = [], []
    for remat in (False, "block"):
        model = build_deeplab_model(
            model_type, 4, output_stride=16, remat=remat
        )
        vars_ = jax.jit(model.init)(jax.random.PRNGKey(0), x)

        def loss(p):
            logits, _ = model.apply(
                {"params": p, "batch_stats": vars_["batch_stats"]}, x,
                train=True, rngs={"dropout": jax.random.PRNGKey(1)},
                mutable=["batch_stats"],
            )
            return jnp.mean(logits**2)

        grads.append(jax.jit(jax.grad(loss))(vars_["params"]))
        treedefs.append(jax.tree_util.tree_structure(vars_["params"]))
    assert treedefs[0] == treedefs[1]
    leaves0 = [np.asarray(l) for l in jax.tree_util.tree_leaves(grads[0])]
    leaves1 = [np.asarray(l) for l in jax.tree_util.tree_leaves(grads[1])]
    # The remat'd program re-runs the fwd inside the bwd with different
    # XLA fusion — summation order changes, so grad entries produced by
    # large-term cancellation (e.g. BN bias grads of mean-subtracted
    # activations, analytically ~0) carry fp32 noise proportional to the
    # NETWORK's gradient scale, not the entry or even the leaf (observed
    # on resnet50: leaves of pure ~1e-4 rounding residue while other
    # leaves reach ~450). Tolerate noise relative to the global scale.
    scale = max(1.0, max(float(np.abs(b).max()) for b in leaves1))
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5 * scale)


def test_remat_rejects_unknown_mode_and_unsupported_backbone():
    from deeplabv3p_tpu.models.factory import build_deeplab_model

    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    with pytest.raises(ValueError, match="off/full/block"):
        build_deeplab_model("mobilenetv2_lite", 4, remat="banana").init(
            jax.random.PRNGKey(0), x
        )
    with pytest.raises(ValueError, match="remat_blocks"):
        build_deeplab_model("peleenet_lite", 4, remat="block").init(
            jax.random.PRNGKey(0), x
        )
