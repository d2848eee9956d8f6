"""TFLite / SavedModel / frozen-pb export tests (reference
tools/model_converter/keras_to_tflite.py, post_train_quant_convert.py,
keras_to_tensorflow.py). Each exported artifact is EXECUTED with the
real TF runtime (tf.lite.Interpreter / wrapped GraphDef) and compared
against the jax forward. Skipped when tensorflow is absent."""

import os
import subprocess
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from deeplabv3p_tpu.export.tf_export import (  # noqa: E402
    FrozenGraphRunner,
    TFLiteRunner,
    export_frozen_pb,
    export_saved_model,
    export_tflite,
    save_tflite,
)

HW, NCLS = 48, 4


@pytest.fixture(scope="module")
def small_model():
    from deeplabv3p_tpu.models.factory import build_deeplab_model

    model = build_deeplab_model("mobilenetv2_lite", NCLS, output_stride=16)
    x = jnp.asarray(
        np.random.RandomState(0).rand(1, HW, HW, 3).astype(np.float32) * 2 - 1
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    # A random-init net emits near-uniform softmax (spread ~1e-4), which
    # int8 quantization legitimately flattens to exactly uniform — argmax
    # would be meaningless. Scale the head so predictions are decisive.
    variables = jax.tree_util.tree_map(lambda a: a, variables)  # unfreeze copy
    head = variables["params"]["conv_upsample"]
    rng = np.random.RandomState(9)
    variables["params"]["conv_upsample"] = {
        "kernel": head["kernel"] * 60.0,
        "bias": jnp.asarray(rng.randn(NCLS).astype(np.float32) * 2.0),
    }

    def fn(images):
        return jax.nn.softmax(model.apply(variables, images, train=False), -1)

    return model, variables, fn, np.asarray(x)


def test_tflite_fp32_roundtrip(small_model):
    model, variables, fn, x = small_model
    content = export_tflite(model, variables, (HW, HW))
    assert len(content) > 1000
    runner = TFLiteRunner(content)
    got = runner(x)
    want = np.asarray(fn(jnp.asarray(x)))
    assert got.shape == want.shape == (1, HW, HW, NCLS)
    np.testing.assert_allclose(got, want, atol=2e-3)
    assert (got.argmax(-1) == want.argmax(-1)).mean() > 0.999


def test_tflite_int8_ptq(small_model, tmp_path):
    """int8 PTQ with a representative dataset (reference
    post_train_quant_convert.py:20-57): artifact shrinks vs fp32 and
    predictions stay close to the float model."""
    model, variables, fn, x = small_model
    rng = np.random.RandomState(3)
    rep = [rng.uniform(-1, 1, (1, HW, HW, 3)).astype(np.float32)
           for _ in range(4)]
    fp32 = export_tflite(model, variables, (HW, HW))
    int8 = export_tflite(
        model, variables, (HW, HW), quantize="int8", representative_data=rep
    )
    assert len(int8) < 0.5 * len(fp32)  # ~4x weight compression

    path = str(tmp_path / "m_int8.tflite")
    save_tflite(int8, path)
    runner = TFLiteRunner(path)
    got = runner(x)
    want = np.asarray(fn(jnp.asarray(x)))
    assert got.shape == want.shape
    # Quality criterion: centered log-prob correlation. A random-init net
    # has near-tied classes at every pixel (top1-top2 logit gap << the
    # int8 step), so argmax agreement is noise here even for a faithful
    # quantization; on trained weights the margins dwarf the int8 step.
    gl = np.log(np.clip(got, 1e-8, 1.0))
    wl = np.log(np.clip(want, 1e-8, 1.0))
    gl -= gl.mean(-1, keepdims=True)
    wl -= wl.mean(-1, keepdims=True)
    corr = np.corrcoef(gl.ravel(), wl.ravel())[0, 1]
    assert corr > 0.9, corr
    assert np.abs(got - want).mean() < 0.1


def test_frozen_pb_roundtrip(small_model, tmp_path):
    model, variables, fn, x = small_model
    path = str(tmp_path / "model.pb")
    in_name, out_name = export_frozen_pb(model, variables, (HW, HW), path)
    assert os.path.exists(path)
    runner = FrozenGraphRunner(path, input_name=in_name, output_name=out_name)
    got = runner(x)
    want = np.asarray(fn(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_saved_model_roundtrip(small_model, tmp_path):
    model, variables, fn, x = small_model
    path = str(tmp_path / "saved")
    export_saved_model(model, variables, (HW, HW), path)
    loaded = tf.saved_model.load(path)
    got = loaded.signatures["serving_default"](
        image_input=tf.constant(x)
    )
    got = list(got.values())[0].numpy()
    want = np.asarray(fn(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_tflite_runner_batches(small_model):
    """Runner loops arbitrary eval batch sizes over the fixed model batch."""
    model, variables, fn, x = small_model
    runner = TFLiteRunner(export_tflite(model, variables, (HW, HW)))
    xs = np.repeat(x, 3, axis=0)
    got = runner(xs)
    assert got.shape == (3, HW, HW, NCLS)
    np.testing.assert_allclose(got[0], got[2], atol=1e-6)


def test_eval_cli_tflite(small_model, tmp_path):
    """eval.py scores a .tflite artifact end-to-end (reference
    eval.py:84-113 tflite branch)."""
    from PIL import Image

    model, variables, fn, x = small_model
    root = tmp_path / "ds"
    os.makedirs(root / "images")
    os.makedirs(root / "labels")
    rng = np.random.RandomState(5)
    ids = []
    for i in range(2):
        img = rng.randint(0, 255, (40, 44, 3), dtype=np.uint8)
        lbl = rng.randint(0, NCLS, (40, 44), dtype=np.uint8)
        Image.fromarray(img).save(root / "images" / f"t{i}.jpg")
        Image.fromarray(lbl).save(root / "labels" / f"t{i}.png")
        ids.append(f"t{i}")
    (root / "list.txt").write_text("\n".join(ids))
    classes = tmp_path / "classes.txt"
    classes.write_text("\n".join(f"c{i}" for i in range(NCLS)))

    tfl = str(tmp_path / "model.tflite")
    save_tflite(export_tflite(model, variables, (HW, HW)), tfl)

    env = dict(os.environ)
    env["JAX_PLATFORMS_FORCE_CPU_TEST"] = "1"
    out = subprocess.run(
        [sys.executable, "eval.py",
         "--model_path", tfl,
         "--model_type", "mobilenetv2_lite",
         "--dataset_path", str(root),
         "--dataset_file", str(root / "list.txt"),
         "--classes_path", str(classes),
         "--model_input_shape", str(HW),
         "--batch_size", "2",
         "--device", "cpu"],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "mIoU" in out.stdout


def test_export_model_cli_tflite(small_model, tmp_path):
    """tools/model_converter/export_model.py --format tflite end-to-end:
    h5 in (written by save_keras_h5_weights), .tflite artifact out,
    runnable by the TFLite interpreter."""
    from deeplabv3p_tpu.utils.keras_import import save_keras_h5_weights

    model, variables, fn, x = small_model
    h5 = str(tmp_path / "m.h5")
    save_keras_h5_weights(h5, variables)
    out = str(tmp_path / "m.tflite")
    r = subprocess.run(
        [sys.executable, "tools/model_converter/export_model.py",
         "--model_path", h5, "--model_type", "mobilenetv2_lite",
         "--num_classes", str(NCLS), "--model_input_shape", str(HW),
         "--format", "tflite", "--output", out, "--device", "cpu"],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    got = TFLiteRunner(out)(x)
    want = np.asarray(fn(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-3)
