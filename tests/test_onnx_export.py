"""ONNX export tests (VERDICT r1 item #9 / reference keras_to_onnx.py +
onnx_edit.py): jaxpr→ONNX conversion checked by executing the emitted
graphs with the numpy reference interpreter against the JAX originals."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from deeplabv3p_tpu.export.onnx import export_onnx, save_onnx  # noqa: E402
from deeplabv3p_tpu.export.onnx.convert import load_onnx  # noqa: E402
from deeplabv3p_tpu.export.onnx.interp import run_model  # noqa: E402


def _check(fn, args, atol=1e-5, **export_kw):
    model = export_onnx(fn, args, **export_kw)
    inputs = {
        vi.name: np.asarray(a)
        for vi, a in zip(model.graph.input, args)
    }
    got = list(run_model(model, inputs).values())
    want = fn(*args)
    want = want if isinstance(want, (tuple, list)) else [want]
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, np.asarray(w), atol=atol, rtol=1e-5)
    return model


# ---------------------------------------------------------------------------
# op-level coverage
# ---------------------------------------------------------------------------

def test_elementwise_chain():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8).astype(np.float32))
    _check(lambda a: jnp.tanh(a) * 2.0 + jax.nn.sigmoid(a) - jnp.abs(a), (x,))


def test_relu6_hardswish():
    x = jnp.asarray(np.random.RandomState(0).randn(4, 7).astype(np.float32))
    _check(lambda a: jax.nn.relu6(a) + jax.nn.hard_swish(a), (x,))


def test_softmax_and_reductions():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 6).astype(np.float32))
    _check(lambda a: jax.nn.softmax(a, -1), (x,))
    _check(lambda a: (a.sum(axis=1), a.max(axis=-1)), (x,))


def test_argmax_predict_graph():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 6, 6, 4).astype(np.float32))
    model = _check(
        lambda a: jnp.argmax(a, axis=-1).astype(jnp.int32), (x,)
    )
    assert any(n.op_type == "ArgMax" for n in model.graph.node)


def test_conv_same_strided_dilated_grouped():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 12, 12, 8).astype(np.float32))
    w1 = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32) * 0.1)
    wd = jnp.asarray(rng.randn(3, 3, 1, 16).astype(np.float32) * 0.1)

    def fn(a):
        y = jax.lax.conv_general_dilated(
            a, w1, (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = jax.lax.conv_general_dilated(
            y, wd, (1, 1), "SAME", rhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=16,
        )
        return y

    model = _check(fn, (x,), atol=1e-4)
    convs = [n for n in model.graph.node if n.op_type == "Conv"]
    assert len(convs) == 2
    attrs = {a.name: list(a.ints) for a in convs[1].attribute
             if a.type == 7}  # INTS
    assert attrs["dilations"] == [2, 2]
    assert any(a.name == "group" and a.i == 16 for a in convs[1].attribute)


def test_pooling():
    import flax.linen as nn

    x = jnp.asarray(
        np.random.RandomState(0).randn(1, 8, 8, 3).astype(np.float32)
    )
    _check(lambda a: nn.max_pool(a, (2, 2), (2, 2)), (x,))
    _check(lambda a: nn.avg_pool(a, (2, 2), (2, 2)), (x,))


def test_resize_bilinear_exports_via_einsum():
    from deeplabv3p_tpu.ops.resize import resize_bilinear

    x = jnp.asarray(
        np.random.RandomState(0).randn(1, 8, 8, 3).astype(np.float32)
    )
    model = _check(lambda a: resize_bilinear(a, (32, 32)), (x,), atol=1e-4)
    # the interpolation weights must constant-fold into Einsum matmuls
    ops = {n.op_type for n in model.graph.node}
    assert "Einsum" in ops
    assert not ops & {"Range", "Iota"}


def test_concat_pad_slice():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5).astype(np.float32))

    def fn(a):
        b = jnp.concatenate([a, a * 2], axis=1)
        c = jnp.pad(b, ((0, 0), (1, 1)), constant_values=0.5)
        return c[:, 2:9]

    _check(fn, (x,))


# ---------------------------------------------------------------------------
# full model graphs
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mnv2_lite_export():
    from deeplabv3p_tpu.models.factory import build_deeplab_model

    model = build_deeplab_model("mobilenetv2_lite", 4, output_stride=16)
    x = jnp.asarray(
        np.random.RandomState(0).rand(1, 48, 48, 3).astype(np.float32) * 2 - 1
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    def fn(images):
        return jax.nn.softmax(model.apply(variables, images, train=False), -1)

    onnx_model = export_onnx(
        fn, (x,), model_name="mobilenetv2_lite",
        input_names=["image_input"], output_names=["pred_mask/Softmax"],
    )
    return fn, x, onnx_model


def test_full_model_export_matches_jax(mnv2_lite_export):
    fn, x, onnx_model = mnv2_lite_export
    got = run_model(onnx_model, {"image_input": np.asarray(x)})
    out = got["pred_mask/Softmax"]
    ref = np.asarray(fn(x))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-5)
    # reference IO naming convention (tensorflow_to_rknn.py:40-41)
    assert onnx_model.graph.input[0].name == "image_input"
    assert onnx_model.graph.output[0].name == "pred_mask/Softmax"
    assert onnx_model.opset_import[0].version == 13
    # all 55 convs present as Conv nodes (not folded away)
    assert sum(n.op_type == "Conv" for n in onnx_model.graph.node) > 50


def test_onnx_file_roundtrip(mnv2_lite_export, tmp_path):
    fn, x, onnx_model = mnv2_lite_export
    path = str(tmp_path / "m.onnx")
    save_onnx(onnx_model, path)
    loaded = load_onnx(path)
    assert len(loaded.graph.node) == len(onnx_model.graph.node)
    got = run_model(loaded, {"image_input": np.asarray(x)})
    np.testing.assert_allclose(
        got["pred_mask/Softmax"], np.asarray(fn(x)), atol=1e-5
    )


def test_onnx_edit_nchw_and_trailing_transpose(mnv2_lite_export):
    from tools.model_converter.onnx_edit import (
        add_nchw_output,
        remove_trailing_transpose,
    )

    fn, x, onnx_model = mnv2_lite_export
    model = type(onnx_model)()
    model.CopyFrom(onnx_model)

    add_nchw_output(model)
    got = run_model(model, {"image_input": np.asarray(x)})
    ref = np.transpose(np.asarray(fn(x)), (0, 3, 1, 2))
    np.testing.assert_allclose(got["pred_mask/Softmax"], ref, atol=1e-5)
    dims = [d.dim_value
            for d in model.graph.output[0].type.tensor_type.shape.dim]
    assert dims == [1, 4, 48, 48]

    # removing the trailing transpose restores NHWC
    assert remove_trailing_transpose(model)
    got = run_model(model, {"image_input": np.asarray(x)})
    np.testing.assert_allclose(
        got["pred_mask/Softmax"], np.asarray(fn(x)), atol=1e-5
    )


def test_export_onnx_cli(tmp_path):
    """The converter CLI end-to-end (reference keras_to_onnx.py CLI)."""
    import subprocess

    out = str(tmp_path / "model.onnx")
    res = subprocess.run(
        [sys.executable, "tools/model_converter/export_onnx.py",
         "--model_type", "mobilenetv2_lite",
         "--classes_path", "configs/voc_classes.txt",
         "--model_input_shape", "64x64",
         "--output_path", out, "--device", "cpu"],
        capture_output=True, text=True,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    model = load_onnx(out)
    assert model.graph.input[0].name == "image_input"
    dims = [d.dim_value
            for d in model.graph.input[0].type.tensor_type.shape.dim]
    assert dims == [1, 64, 64, 3]


def test_eval_cli_with_onnx_model(tmp_path):
    """eval.py dispatches .onnx artifacts (reference eval.py:542-575
    multi-format loader) — end-to-end on a tiny synthetic dataset."""
    import subprocess

    from PIL import Image

    repo = os.path.join(os.path.dirname(__file__), "..")
    # tiny dataset
    root = tmp_path / "ds"
    os.makedirs(root / "images")
    os.makedirs(root / "labels")
    rng = np.random.RandomState(0)
    ids = []
    for i in range(2):
        Image.fromarray(
            rng.randint(0, 255, (40, 40, 3), np.uint8)
        ).save(root / "images" / f"s{i}.jpg")
        Image.fromarray(
            rng.randint(0, 3, (40, 40), np.uint8)
        ).save(root / "labels" / f"s{i}.png")
        ids.append(f"s{i}")
    (tmp_path / "list.txt").write_text("\n".join(ids) + "\n")
    (tmp_path / "classes.txt").write_text("background\na\nb\n")

    onnx_path = str(tmp_path / "m.onnx")
    res = subprocess.run(
        [sys.executable, "tools/model_converter/export_onnx.py",
         "--model_type", "mobilenetv2_lite",
         "--classes_path", str(tmp_path / "classes.txt"),
         "--model_input_shape", "32x32",
         "--batch_size", "2",
         "--output_path", onnx_path, "--device", "cpu"],
        capture_output=True, text=True, cwd=repo,
    )
    assert res.returncode == 0, res.stderr[-2000:]

    res = subprocess.run(
        [sys.executable, "eval.py",
         "--model_path", onnx_path,
         "--model_type", "mobilenetv2_lite",
         "--dataset_path", str(root),
         "--dataset_file", str(tmp_path / "list.txt"),
         "--classes_path", str(tmp_path / "classes.txt"),
         "--model_input_shape", "32x32",
         "--batch_size", "2",
         "--device", "cpu"],
        capture_output=True, text=True, cwd=repo,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "mIoU=" in res.stdout
