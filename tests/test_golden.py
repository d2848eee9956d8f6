"""Golden real-image regression tests (VERDICT round-1 item #1).

The reference ships paired image+GT fixtures (`example/2007_000039.{jpg,png}`,
`example/2007_000346.{jpg,png}`, cited as the de-facto test fixtures in
/root/reference/inference/README.md:104); they are vendored into `example/`.

These tests lock the full accuracy chain — JPEG decode → PIL bicubic resize
→ [-1,1] normalize → bf16 forward → argmax → nearest mask resize → streaming
confusion matrix → metric suite — against values captured once on this
platform. Any drift in resize/padding/normalization/import conventions
(SURVEY.md §7 "bit-comparable mIOU" hard part) fails them.

Regenerate after an *intentional* change with:
    python tests/test_golden.py regen
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
EXAMPLE = os.path.join(REPO, "example")
FIXTURE_MASK = os.path.join(HERE, "fixtures", "golden_voc_mask.npz")
FIXTURE_METRICS = os.path.join(HERE, "fixtures", "golden_voc_metrics.json")
FIXTURE_DEMO = os.path.join(HERE, "fixtures", "golden_demo_masks.json")

IMAGE_IDS = ["2007_000039", "2007_000346"]
# 3 of the reference's 12 vendored demo assets (reference example/,
# cited by its inference/README.md:104) — the demo-CLI golden set
# (VERDICT r4 #5)
DEMO_IDS = ["air", "dog", "person"]


def test_voc_palette_label_decode():
    """VOC palette PNGs must decode to raw class indices (PIL 'P' mode),
    incl. the 255 ignore border (reference label convention,
    /root/reference/train.py:34)."""
    lbl = Image.open(os.path.join(EXAMPLE, "2007_000039.png"))
    assert lbl.mode == "P"
    a = np.asarray(lbl)
    assert a.dtype == np.uint8 and a.shape == (375, 500)
    assert set(np.unique(a)) == {0, 20, 255}  # background / tvmonitor / ignore
    a2 = np.asarray(Image.open(os.path.join(EXAMPLE, "2007_000346.png")))
    assert set(np.unique(a2)) == {0, 5, 15, 255}  # bg / bottle / person / ign


def _build_golden_deeplab():
    """Seeded 512x512 VOC DeepLab (PRNGKey(0) init — deterministic on this
    platform), with the head bias tilted toward background so predictions
    overlap GT nontrivially (a pure random init never predicts class 0,
    which would make every golden metric 0 and the lock vacuous)."""
    from deeplabv3p_tpu.inference import DeepLab

    deeplab = DeepLab(
        model_type="mobilenetv2_lite",
        classes_path=os.path.join(REPO, "configs", "voc_classes.txt"),
        model_input_shape=(512, 512),
    )
    bias = np.asarray(deeplab.variables["params"]["conv_upsample"]["bias"])
    bias = bias.copy()
    bias[0] += 2.0
    deeplab.variables["params"]["conv_upsample"]["bias"] = bias
    return deeplab


@pytest.fixture(scope="module")
def deeplab_voc():
    return _build_golden_deeplab()


def _predict_origin_mask(deeplab, image_id):
    from deeplabv3p_tpu.inference import preprocess_image

    image = Image.open(os.path.join(EXAMPLE, image_id + ".jpg"))
    data = preprocess_image(image, deeplab.model_input_shape)
    return deeplab.predict(data, tuple(reversed(image.size)))


def _eval_dataset(tmp_dir):
    """Build the 2-pair dataset in the reference layout
    (<ds>/images/<id>.jpg + <ds>/labels/<id>.png, data.py:25-26)."""
    import shutil

    os.makedirs(os.path.join(tmp_dir, "images"), exist_ok=True)
    os.makedirs(os.path.join(tmp_dir, "labels"), exist_ok=True)
    for i in IMAGE_IDS:
        shutil.copy(os.path.join(EXAMPLE, i + ".jpg"),
                    os.path.join(tmp_dir, "images", i + ".jpg"))
        shutil.copy(os.path.join(EXAMPLE, i + ".png"),
                    os.path.join(tmp_dir, "labels", i + ".png"))
    return tmp_dir


def _run_eval(deeplab, ds_dir):
    from deeplabv3p_tpu.eval import eval_miou

    return eval_miou(
        deeplab.model, deeplab.variables, ds_dir, IMAGE_IDS,
        class_names=deeplab.class_names,
        model_input_shape=(512, 512), batch_size=2,
    )


def test_golden_predicted_mask_pinned(deeplab_voc):
    """Exact predicted mask on a real image with fixed weights — pins
    decode + bicubic resize + normalize + forward + argmax + nearest
    mask-resize (reference flow deeplab.py:81-109)."""
    if not os.path.exists(FIXTURE_MASK):
        pytest.skip("fixture missing — run `python tests/test_golden.py regen`")
    golden = np.load(FIXTURE_MASK)
    for image_id in IMAGE_IDS:
        mask = _predict_origin_mask(deeplab_voc, image_id)
        want = golden[image_id]
        assert mask.shape == want.shape
        agree = float((mask == want).mean())
        assert agree == 1.0, f"{image_id}: golden mask drift ({agree:.4%} match)"


def test_golden_eval_metrics_pinned(deeplab_voc, tmp_path):
    """Locked metric values for the full eval pipeline on the 2-pair real
    dataset (reference eval_mIOU, eval.py:376-512)."""
    if not os.path.exists(FIXTURE_METRICS):
        pytest.skip("fixture missing — run `python tests/test_golden.py regen`")
    with open(FIXTURE_METRICS) as f:
        want = json.load(f)
    m = _run_eval(deeplab_voc, _eval_dataset(str(tmp_path / "ds")))
    got = {
        "miou": float(m.miou),
        "pixel_acc": float(m.pixel_acc),
        "mean_class_acc": float(m.mean_class_acc),
        "fwiou": float(m.fwiou),
    }
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-6), (k, got[k], v)


def _demo_mask_record(mask, class_names):
    import hashlib

    return {
        "sha256": hashlib.sha256(
            np.ascontiguousarray(mask.astype(np.uint8)).tobytes()
        ).hexdigest(),
        "shape": list(mask.shape),
        "classes": sorted({class_names[c] for c in np.unique(mask)}),
    }


def test_golden_demo_masks_pinned(deeplab_voc):
    """Exact predicted masks + detected-class lists on the reference's
    demo images (reference deeplab.py:81-109 flow) with fixed seeded
    weights — the demo-CLI golden set (VERDICT r4 #5)."""
    if not os.path.exists(FIXTURE_DEMO):
        pytest.skip("fixture missing — run `python tests/test_golden.py regen`")
    with open(FIXTURE_DEMO) as f:
        golden = json.load(f)
    for image_id in DEMO_IDS:
        mask = _predict_origin_mask(deeplab_voc, image_id)
        got = _demo_mask_record(mask, deeplab_voc.class_names)
        assert got == golden[image_id], (image_id, got, golden[image_id])


def test_demo_cli_end_to_end(deeplab_voc, tmp_path):
    """Drive the real `deeplab.py` CLI (subprocess, batch image mode) on
    the demo images with the golden seeded weights saved as a .ckpt, and
    require its saved overlays to be pixel-identical to the overlay of
    the PINNED golden mask — ties the CLI path (arg parsing, ckpt load,
    piped-filename loop, overlay save; reference deeplab.py:175-185) to
    the golden fixtures end-to-end."""
    import shutil
    import subprocess
    import sys

    if not os.path.exists(FIXTURE_DEMO):
        pytest.skip("fixture missing — run `python tests/test_golden.py regen`")
    from deeplabv3p_tpu.utils.checkpoint import save_variables
    from deeplabv3p_tpu.utils.visualize import visualize_segmentation

    ckpt = str(tmp_path / "golden.ckpt")
    save_variables(ckpt, deeplab_voc.variables)
    # feed PNG-named copies so the CLI's basename-derived outputs are
    # saved LOSSLESSLY (PIL picks the format from the extension)
    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    stdin_lines = []
    for image_id in DEMO_IDS:
        dst = in_dir / f"{image_id}.png"
        shutil.copy(os.path.join(EXAMPLE, image_id + ".jpg"), dst)
        stdin_lines.append(str(dst))
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "deeplab.py"),
         "--model_type", "mobilenetv2_lite",
         "--classes_path", os.path.join(REPO, "configs", "voc_classes.txt"),
         "--model_input_shape", "512",
         "--weights_path", ckpt,
         "--image", "--output", str(out_dir),
         "--device", "cpu"],  # subprocess inherits no conftest config
        input="\n".join(stdin_lines) + "\n",
        capture_output=True, text=True, timeout=900, cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    for image_id in DEMO_IDS:
        saved = np.asarray(Image.open(out_dir / f"{image_id}.png"))
        image = Image.open(os.path.join(EXAMPLE, image_id + ".jpg"))
        mask = _predict_origin_mask(deeplab_voc, image_id)
        want = visualize_segmentation(
            np.array(image), mask, class_names=deeplab_voc.class_names
        )
        assert saved.shape == want.shape, (image_id, saved.shape, want.shape)
        assert np.array_equal(saved, want), (
            f"{image_id}: CLI overlay diverged from the golden mask's "
            f"overlay ({(saved != want).mean():.4%} of pixels)"
        )


def test_gt_as_prediction_gives_perfect_miou(tmp_path):
    """Independent oracle for the eval machinery: feeding the GT labels
    through the confusion-matrix path must give mIoU == PixelAcc == 1
    on real VOC labels (exercises 255-ignore masking on real borders)."""
    import jax.numpy as jnp

    from deeplabv3p_tpu import metrics as metrics_lib

    cm = np.zeros((21, 21), np.int64)
    for image_id in IMAGE_IDS:
        lbl = np.asarray(
            Image.open(os.path.join(EXAMPLE, image_id + ".png"))
        ).astype(np.int32)
        cm += np.asarray(metrics_lib.confusion_matrix(
            jnp.asarray(lbl)[None], jnp.asarray(lbl)[None], 21
        ))
    assert cm.sum() > 0
    assert np.all(cm == np.diag(np.diag(cm)))  # nothing off-diagonal
    m = metrics_lib.segment_metrics_from_confusion(cm)
    assert m.pixel_acc == 1.0 and m.fwiou == 1.0
    present = np.diag(cm) > 0
    assert set(np.flatnonzero(present)) == {0, 5, 15, 20}
    assert np.all(m.iou[present] == 1.0)
    # reference quirk (eval.py:473-497): absent classes keep IoU 0 after
    # NaN→0 and still enter the mean, so mIoU = n_present / n_classes
    assert m.miou == pytest.approx(4 / 21)


def _regen():
    import sys

    sys.path.insert(0, REPO)
    # mirror tests/conftest.py platform setup (goldens are CPU-mesh values)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_threefry_partitionable", True)

    import tempfile

    deeplab = _build_golden_deeplab()
    os.makedirs(os.path.dirname(FIXTURE_MASK), exist_ok=True)
    masks = {i: _predict_origin_mask(deeplab, i).astype(np.uint8)
             for i in IMAGE_IDS}
    np.savez_compressed(FIXTURE_MASK, **masks)
    print("wrote", FIXTURE_MASK, {k: v.shape for k, v in masks.items()})

    demo = {
        i: _demo_mask_record(
            _predict_origin_mask(deeplab, i), deeplab.class_names
        )
        for i in DEMO_IDS
    }
    with open(FIXTURE_DEMO, "w") as f:
        json.dump(demo, f, indent=1)
    print("wrote", FIXTURE_DEMO, demo)

    with tempfile.TemporaryDirectory() as td:
        m = _run_eval(deeplab, _eval_dataset(td))
    vals = {
        "miou": float(m.miou),
        "pixel_acc": float(m.pixel_acc),
        "mean_class_acc": float(m.mean_class_acc),
        "fwiou": float(m.fwiou),
    }
    with open(FIXTURE_METRICS, "w") as f:
        json.dump(vals, f, indent=1)
    print("wrote", FIXTURE_METRICS, vals)


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        _regen()
    else:
        print(__doc__)
