"""ONNX export breadth: EVERY registry model converts; one model per
family round-trips numerically through the numpy interpreter.

Closes VERDICT r2 item #4 (reference parity: keras_to_onnx.py:34-56
converts any model — including UNet's Conv2DTranspose, which needs the
ConvTranspose lowering added in round 3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplabv3p_tpu.export.onnx.convert import export_onnx
from deeplabv3p_tpu.export.onnx.interp import run_model
from deeplabv3p_tpu.models.factory import (
    DEEPLAB_MODEL_REGISTRY,
    build_segmentation_model,
)
from deeplabv3p_tpu.models.fast_scnn import FAST_SCNN_MODEL_REGISTRY
from deeplabv3p_tpu.models.unet import UNET_MODEL_REGISTRY

ALL_MODELS = (
    sorted(DEEPLAB_MODEL_REGISTRY)
    + sorted(UNET_MODEL_REGISTRY)
    + sorted(FAST_SCNN_MODEL_REGISTRY)
)

# one representative per backbone family / head style for the (slower)
# numerical round-trip through the interpreter
FAMILY_REPRESENTATIVES = [
    "mobilenetv2_lite",
    "mobilenetv3small_lite",
    "mobilevit_xxs_lite",
    "peleenet_lite",
    "ghostnet_lite",
    "resnet50",
    "xception",
    "unet_standard",
    "unet_lite",
    "unet_simple",
    "fast_scnn",
]

NUM_CLASSES = 4
HW = 64


def _build_and_trace(model_type):
    model = build_segmentation_model(model_type, NUM_CLASSES, output_stride=16)
    x = jnp.asarray(
        np.random.RandomState(0).rand(1, HW, HW, 3).astype(np.float32) * 2 - 1
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    def fn(img):
        return jax.nn.softmax(model.apply(variables, img, train=False), -1)

    return fn, x


@pytest.mark.parametrize("model_type", ALL_MODELS)
def test_every_registry_model_exports(model_type):
    """No primitive in any registry model may hit a converter gap."""
    fn, x = _build_and_trace(model_type)
    model = export_onnx(
        fn, (x,), input_names=["image_input"],
        output_names=["pred_mask/Softmax"],
    )
    assert len(model.graph.node) > 0
    assert model.graph.output[0].name == "pred_mask/Softmax"


@pytest.mark.parametrize("model_type", FAMILY_REPRESENTATIVES)
def test_family_representative_onnx_roundtrip(model_type):
    """Exported graph executes (numpy interpreter) and matches the JAX
    forward numerically."""
    fn, x = _build_and_trace(model_type)
    want = np.asarray(fn(x))
    model = export_onnx(fn, (x,), input_names=["image_input"])
    got = run_model(model, {"image_input": np.asarray(x)})
    got = list(got.values())[0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
