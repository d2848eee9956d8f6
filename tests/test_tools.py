"""Tests for dataset converters, export, quantization, and runtime."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

RNG = np.random.RandomState(0)


# --- label utils / converters ------------------------------------------------


def test_label_save_roundtrip(tmp_path):
    from tools.dataset_converter.label_utils import label_load, label_save

    label = RNG.randint(0, 21, size=(16, 20)).astype(np.uint8)
    p = str(tmp_path / "l.png")
    label_save(p, label)
    np.testing.assert_array_equal(label_load(p), label)
    # saved as palette PNG
    assert Image.open(p).mode == "P"


def test_cityscapes_trainid_mapping():
    from tools.dataset_converter.cityscapes import id_to_trainid_array

    raw = np.array([[0, 7, 8, 26], [33, 5, 24, 19]], np.uint8)
    out = id_to_trainid_array(raw)
    expected = np.array([[255, 0, 1, 13], [18, 255, 11, 6]], np.uint8)
    np.testing.assert_array_equal(out, expected)


def test_camvid_color_lut_roundtrip():
    from tools.dataset_converter.camvid import (
        build_color_lut,
        encode_label_img,
        read_color_map,
    )

    names, colors = read_color_map(None)
    assert len(names) == 32 and "void" in names
    lut = build_color_lut(colors)
    # build an image from colors of classes 0, 5, 17
    img = np.zeros((2, 3, 3), np.uint8)
    img[0, 0] = colors[0]
    img[0, 1] = colors[5]
    img[1, 2] = colors[17]
    label = encode_label_img(img, lut)
    assert label[0, 0] == 0 and label[0, 1] == 5 and label[1, 2] == 17


def test_camvid_class_subset_remap():
    from tools.dataset_converter.camvid import class_label_convert, read_color_map

    full, _ = read_color_map(None)
    subset = ["void", "road", "sky", "car"]
    label = np.array([full.index("road"), full.index("animal"),
                      full.index("sky")])
    out = class_label_convert(label, full, subset)
    assert out[0] == subset.index("road")
    assert out[1] == subset.index("void")  # non-selected -> void
    assert out[2] == subset.index("sky")


def test_labelme_shapes_to_label():
    from tools.dataset_converter.labelme_convert import shapes_to_label

    shapes = [
        {"label": "car", "shape_type": "rectangle",
         "points": [[2, 2], [8, 6]]},
        {"label": "person", "shape_type": "polygon",
         "points": [[10, 1], [14, 1], [14, 5], [10, 5]]},
    ]
    label = shapes_to_label((10, 16, 3), shapes,
                            {"background": 0, "car": 1, "person": 2})
    assert label[4, 4] == 1
    assert label[3, 12] == 2
    assert label[0, 0] == 0


def test_ade20k_shift(tmp_path):
    from tools.dataset_converter.ade20k import gray_label_convert
    from tools.dataset_converter.label_utils import label_load

    src = tmp_path / "src"
    dst = tmp_path / "dst"
    os.makedirs(src)
    label = np.array([[0, 1], [150, 3]], np.uint8)
    Image.fromarray(label).save(src / "a.png")
    gray_label_convert(str(src), str(dst), shift=True)
    out = label_load(str(dst / "a.png"))
    np.testing.assert_array_equal(out, [[255, 0], [149, 2]])


# --- export / quantize -------------------------------------------------------


@pytest.fixture(scope="module")
def small_model():
    from deeplabv3p_tpu.models.factory import build_deeplab_model

    model = build_deeplab_model("mobilenetv2_lite", 4, output_stride=32)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables, x


def test_stablehlo_export_roundtrip(small_model, tmp_path):
    from deeplabv3p_tpu.export.stablehlo import (
        export_model, load_exported, save_exported,
    )

    model, variables, x = small_model
    exported = export_model(model, variables, (32, 32))
    path = str(tmp_path / "m.shlo")
    save_exported(exported, path)
    fn = load_exported(path)
    out = jax.jit(fn)(np.zeros((1, 32, 32, 3), np.float32))
    ref = jax.nn.softmax(model.apply(variables, x, train=False), axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_post_train_quantize_roundtrip(small_model):
    from deeplabv3p_tpu.export.quantize import (
        QuantizedTensor, dequantize_params, post_train_quantize,
    )

    model, variables, x = small_model
    qparams, stats = post_train_quantize(variables["params"])
    assert stats["quantized_kernels"] > 10
    assert stats["compression"] > 3.0

    deq = dequantize_params(qparams)
    # quantization error bounded by scale/2 per weight
    orig = variables["params"]["conv_upsample"]["kernel"]
    got = deq["conv_upsample"]["kernel"]
    q = qparams["conv_upsample"]["kernel"]
    assert isinstance(q, QuantizedTensor)
    max_err = np.abs(np.asarray(orig) - np.asarray(got)).max()
    assert max_err <= float(q.scale.max())

    # logits with dequantized weights stay close
    variables_q = {"params": deq, "batch_stats": variables["batch_stats"]}
    ref = model.apply(variables, x, train=False)
    out = model.apply(variables_q, x, train=False)
    assert np.abs(np.asarray(ref) - np.asarray(out)).max() < 0.35


def test_runtime_runner_ckpt(small_model, tmp_path):
    from deeplabv3p_tpu.runtime import Runner
    from deeplabv3p_tpu.utils.checkpoint import save_variables

    model, variables, x = small_model
    path = str(tmp_path / "m.ckpt")
    save_variables(path, variables)
    runner = Runner(path, model_type="mobilenetv2_lite", num_classes=4,
                    input_height=32, input_width=32)
    data = np.zeros((1, 32, 32, 3), np.float32).tobytes()
    probs_bytes, h, w, c = runner.run_bytes(data, 1, 32, 32)
    assert (h, w, c) == (32, 32, 4)
    probs = np.frombuffer(probs_bytes, np.float32).reshape(1, 32, 32, 4)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-3)


def test_checkpoint_manager_retention(tmp_path, small_model):
    from deeplabv3p_tpu.utils.checkpoint import CheckpointManager, load_variables

    _, variables, _ = small_model
    mgr = CheckpointManager(str(tmp_path), max_val_keep=2, max_eval_keep=1)
    for e in range(4):
        mgr.save_epoch(variables, e, {"loss": 1.0, "jaccard": 0.5})
    import glob

    assert len(glob.glob(str(tmp_path / "ep*.ckpt"))) == 2
    mgr.save_eval_best(variables, 1, 0.5)
    mgr.save_eval_best(variables, 2, 0.6)
    assert len(glob.glob(str(tmp_path / "eval_ep*.ckpt"))) == 1
    final = mgr.save_final(variables)
    loaded = load_variables(final, variables)
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["conv_upsample"]["kernel"]),
        np.asarray(variables["params"]["conv_upsample"]["kernel"]),
    )


def test_model_statistics():
    from tools.evaluation.model_statistics import model_statistics

    n_params, flops = model_statistics(
        "mobilenetv2_lite", num_classes=4, input_shape=(64, 64),
        output_stride=32,
    )
    assert n_params > 1e6  # MobileNetV2 backbone ~2M params
    assert flops > 1e7 or np.isnan(flops)


def test_step_timer_summary():
    import time

    from deeplabv3p_tpu.utils.profiler import StepTimer

    t = StepTimer(warmup=1)
    for _ in range(4):
        with t:
            time.sleep(0.002)
    s = t.summary()
    assert s["steps"] == 3  # warmup step skipped
    assert s["mean_ms"] >= 1.5
    assert s["p90_ms"] >= s["p50_ms"]
