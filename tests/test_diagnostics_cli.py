"""Smoke tests for the diagnostics CLIs (PARITY.md rows D4/D5/D8/D9 —
reference tools/evaluation/{featuremap,convkernel}_check.py and
tools/misc/{augment_test,edge_detect}.py counterparts): each tool runs
end-to-end on tiny inputs and writes its artifacts."""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLE = os.path.join(REPO, "example")


def _run(args, timeout=600, device_arg=True):
    # JAX CLIs must get --device cpu: a spawned subprocess inherits no
    # conftest config and would silently attach the real TPU (CLAUDE.md
    # rule 13). edge_detect is pure cv2 and takes no device arg.
    res = subprocess.run(
        [sys.executable] + args + (["--device", "cpu"] if device_arg else []),
        capture_output=True, text=True, timeout=timeout, cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    return res


def test_featuremap_check_dumps_layer_grids(tmp_path):
    out = tmp_path / "fmaps"
    _run([
        "tools/evaluation/featuremap_check.py",
        "--model_type", "mobilenetv2_lite",
        "--image_file", os.path.join(EXAMPLE, "dog.jpg"),
        "--output_path", str(out),
        "--model_input_shape", "64",
    ])
    pngs = list(out.glob("*.png"))
    assert pngs, "no featuremap grids written"


def test_convkernel_check_writes_ascent_grid(tmp_path):
    out = tmp_path / "kernels.png"
    _run([
        "tools/evaluation/convkernel_check.py",
        "--model_type", "mobilenetv2_lite",
        "--layer", "Conv",
        "--num_filters", "2",
        "--image_size", "64",
        "--steps", "3",
        "--output", str(out),
    ])
    assert out.exists() and out.stat().st_size > 0


def test_augment_test_writes_samples(tmp_path):
    out = tmp_path / "aug"
    _run([
        "tools/misc/augment_test.py",
        "--image_file", os.path.join(EXAMPLE, "2007_000039.jpg"),
        "--label_file", os.path.join(EXAMPLE, "2007_000039.png"),
        "--output_path", str(out),
        "--input_shape", "64",
        "--count", "2",
    ])
    assert len(list(out.iterdir())) >= 2


def test_train_phase_profile_emits_roofline_json():
    # ~6 min on the 1-core CI box (7 program compiles) — the price of
    # covering the roofline tool VERDICT r4 #4 leans on. optim_state_ab
    # and train_leg share bench.bench_train_throughput (exercised here
    # via train_step) and their state_dtype plumbing is covered by
    # tests/test_optimizers.py, so they get no separate subprocess test.
    import json

    res = _run([
        "tools/evaluation/train_phase_profile.py",
        "--model_type", "mobilenetv2_lite",
        "--batch", "1",
        "--model_input_shape", "64",
        "--iters", "1",
    ], timeout=1200)
    out = json.loads(res.stdout.strip().splitlines()[-1])
    phases = {r["phase"] for r in out["phases"]}
    assert {"forward", "grad (fwd+bwd)", "train_step"} <= phases
    assert "bwd_ms" in out["deltas"]


@pytest.mark.parametrize("edge_type", ["sobel", "canny"])
def test_edge_detect_writes_edge_map(tmp_path, edge_type):
    pytest.importorskip("cv2")
    out = tmp_path / f"edges_{edge_type}"
    _run([
        "tools/misc/edge_detect.py",
        "--input_path", os.path.join(EXAMPLE, "2007_000039.png"),
        "--output_path", str(out),
        "--edge_type", edge_type,
    ], device_arg=False)
    outs = sorted(out.glob("*.png"))
    assert outs, "no edge map written"
    arr = np.asarray(Image.open(outs[0]).convert("L"))
    assert arr.std() > 0, "edge map is blank"
