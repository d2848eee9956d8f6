"""End-to-end tests for the DeepLab inference API and the eval pipeline
(reference deeplab.py / eval.py flows), on the CPU mesh with a synthetic
dataset."""

import os

import numpy as np
import pytest
from PIL import Image

NUM_CLASSES = 4
HW = 32


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("evds")
    os.makedirs(root / "images")
    os.makedirs(root / "labels")
    rng = np.random.RandomState(1)
    ids = []
    for i in range(4):
        img = rng.randint(0, 255, size=(48, 52, 3), dtype=np.uint8)
        lbl = rng.randint(0, NUM_CLASSES, size=(48, 52), dtype=np.uint8)
        Image.fromarray(img).save(root / "images" / f"s{i}.jpg")
        Image.fromarray(lbl).save(root / "labels" / f"s{i}.png")
        ids.append(f"s{i}")
    return str(root), ids


def test_deeplab_segment_image(tmp_path):
    from deeplabv3p_tpu.inference import DeepLab

    deeplab = DeepLab(
        model_type="mobilenetv2_lite",
        class_names=["background", "a", "b", "c"],
        model_input_shape=(HW, HW),
    )
    rng = np.random.RandomState(0)
    image = Image.fromarray(
        rng.randint(0, 255, size=(40, 56, 3), dtype=np.uint8)
    )
    result = deeplab.segment_image(image)
    assert result.size[0] > 0 and result.size[1] > 0

    # predict() returns a mask at original size with valid class ids
    from deeplabv3p_tpu.inference import preprocess_image

    data = preprocess_image(image, (HW, HW))
    mask = deeplab.predict(data, (40, 56))
    assert mask.shape == (40, 56)
    assert set(np.unique(mask)).issubset(set(range(NUM_CLASSES)))


def test_deeplab_with_crf():
    from deeplabv3p_tpu.inference import DeepLab, preprocess_image

    deeplab = DeepLab(
        model_type="mobilenetv2_lite",
        class_names=["background", "a", "b", "c"],
        model_input_shape=(HW, HW),
        do_crf=True,
    )
    rng = np.random.RandomState(0)
    image = Image.fromarray(
        rng.randint(0, 255, size=(HW, HW, 3), dtype=np.uint8)
    )
    data = preprocess_image(image, (HW, HW))
    mask = deeplab.predict(data, (HW, HW))
    assert mask.shape == (HW, HW)


def test_eval_miou_pipeline(dataset_dir, tmp_path, capsys):
    import jax

    from deeplabv3p_tpu.eval import eval_miou
    from deeplabv3p_tpu.models.factory import build_deeplab_model

    root, ids = dataset_dir
    model = build_deeplab_model("mobilenetv2_lite", NUM_CLASSES,
                                output_stride=16)
    import jax.numpy as jnp

    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, HW, HW, 3), jnp.float32)
    )
    m = eval_miou(
        model, variables, root, ids,
        class_names=["background", "a", "b", "c"],
        model_input_shape=(HW, HW), batch_size=2,
        save_result=True, plots=True, out_dir=str(tmp_path / "result"),
    )
    assert 0.0 <= m.miou <= 1.0
    out = capsys.readouterr().out
    assert "mIoU=" in out and "FWIoU=" in out
    # result artifacts written
    assert os.path.exists(tmp_path / "result" / "mIOU.png")
    assert os.path.exists(tmp_path / "result" / "confusion_matrix.png")
    assert len(os.listdir(tmp_path / "result" / "labels")) == 4
    assert len(os.listdir(tmp_path / "result" / "segmentation")) == 4


def test_onboard_scorer_perfect_prediction(dataset_dir, tmp_path):
    """PNG-vs-PNG scorer (N5 equivalent): GT scored against itself must
    give mIoU == 1."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.evaluation.onboard_segment_eval import eval_miou_pngs

    root, ids = dataset_dir
    gt = os.path.join(root, "labels")
    m = eval_miou_pngs(
        ids, gt, gt, ["background", "a", "b", "c"], (48, 52)
    )
    assert m.miou == 1.0
    assert m.pixel_acc == 1.0


def test_stablehlo_dump_and_runtime_roundtrip(tmp_path):
    """DeepLab --dump_model .shlo path + native-runtime Runner loading it
    (the artifact flow the C++ CLI consumes)."""
    import jax
    import numpy as np

    from deeplabv3p_tpu.export.stablehlo import export_model, save_exported
    from deeplabv3p_tpu.inference import DeepLab
    from deeplabv3p_tpu.runtime import Runner

    deeplab = DeepLab(
        model_type="mobilenetv2_lite",
        class_names=["background", "a", "b", "c"],
        model_input_shape=(HW, HW),
    )
    path = str(tmp_path / "m.shlo")
    exported = export_model(
        deeplab.model, deeplab.variables, (HW, HW)
    )
    save_exported(exported, path)

    runner = Runner(path, input_height=HW, input_width=HW)
    data = np.zeros((1, HW, HW, 3), np.float32).tobytes()
    probs_bytes, h, w, c = runner.run_bytes(data, 1, HW, HW)
    assert (h, w, c) == (HW, HW, NUM_CLASSES)
    probs = np.frombuffer(probs_bytes, np.float32)
    np.testing.assert_allclose(
        probs.reshape(1, HW, HW, NUM_CLASSES).sum(-1), 1.0, atol=1e-3
    )


def test_nonsquare_input_pipeline(tmp_path):
    """Cityscapes-style non-square inputs (H != W) through loader,
    augmentation, model, and eval — catches (h, w)/(w, h) mixups."""
    import jax
    import jax.numpy as jnp

    from deeplabv3p_tpu.data.augment import AugmentConfig, augment_batch
    from deeplabv3p_tpu.data.pipeline import SegmentationDataset
    from deeplabv3p_tpu.models.factory import build_deeplab_model

    root = tmp_path / "ds"
    os.makedirs(root / "images")
    os.makedirs(root / "labels")
    rng = np.random.RandomState(0)
    for i in range(2):
        img = rng.randint(0, 255, size=(100, 220, 3), dtype=np.uint8)
        lbl = rng.randint(0, 3, size=(100, 220), dtype=np.uint8)
        Image.fromarray(img).save(root / "images" / f"x{i}.jpg")
        Image.fromarray(lbl).save(root / "labels" / f"x{i}.png")

    h, w = 32, 64  # non-square model input
    ds = SegmentationDataset(
        str(root), ["x0", "x1"], batch_size=2, num_classes=3,
        input_shape=(h, w), augment=True, num_workers=2,
    )
    images, labels, orig = next(iter(ds.epoch_batches()))
    assert images.shape == (2, h, w, 3)
    assert labels.shape == (2, h, w)
    assert (orig == [100.0, 220.0]).all()

    aug_img, aug_lbl, wts = augment_batch(
        jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(labels),
        jnp.asarray(orig), AugmentConfig(), num_classes=3,
    )
    assert aug_img.shape == (2, h, w, 3)
    assert aug_lbl.shape == (2, h, w)

    model = build_deeplab_model("mobilenetv2_lite", 3, output_stride=16)
    vars_ = model.init(jax.random.PRNGKey(0), aug_img)
    logits = model.apply(vars_, aug_img)
    assert logits.shape == (2, h, w, 3)


def test_segment_video(tmp_path):
    """Per-frame video segmentation loop (reference segment_video,
    deeplab.py:123-172): tiny synthetic mp4 in, overlay video out."""
    import cv2

    from deeplabv3p_tpu.inference import DeepLab

    src = str(tmp_path / "in.mp4")
    rng = np.random.RandomState(0)
    writer = cv2.VideoWriter(
        src, cv2.VideoWriter_fourcc(*"mp4v"), 5.0, (48, 40)
    )
    assert writer.isOpened()
    for _ in range(3):
        writer.write(rng.randint(0, 255, (40, 48, 3), dtype=np.uint8))
    writer.release()

    deeplab = DeepLab(
        model_type="mobilenetv2_lite",
        class_names=["background", "a", "b", "c"],
        model_input_shape=(HW, HW),
    )
    out = str(tmp_path / "out.mp4")
    deeplab.segment_video(src, out)
    assert os.path.exists(out) and os.path.getsize(out) > 0
    vid = cv2.VideoCapture(out)
    assert vid.isOpened()
    n = 0
    while True:
        ok, frame = vid.read()
        if not ok:
            break
        assert frame.shape == (40, 48, 3)
        n += 1
    vid.release()
    assert n == 3


def test_onboard_png_convert_roundtrip(tmp_path):
    """Gray index labels -> VOC palette PNGs (reference
    onboard_png_convert.py:14-52): pixel indices survive the palette
    encoding and the palette is the VOC bit-shift colormap."""
    import sys

    sys.path.insert(0, ".")
    from tools.evaluation.onboard_png_convert import label_convert
    from deeplabv3p_tpu.utils.visualize import create_pascal_label_colormap

    src = tmp_path / "gray"
    dst = tmp_path / "voc"
    os.makedirs(src)
    rng = np.random.RandomState(3)
    labels = {}
    for i in range(3):
        arr = rng.randint(0, 5, size=(20, 24), dtype=np.uint8)
        Image.fromarray(arr).save(src / f"m{i}.png")
        labels[f"m{i}"] = arr

    n = label_convert(str(src), str(dst), class_names=[f"c{k}" for k in range(5)])
    assert n == 3
    for name, arr in labels.items():
        img = Image.open(dst / f"{name}.png")
        assert img.mode == "P"
        np.testing.assert_array_equal(np.array(img), arr)
        palette = np.array(img.getpalette()).reshape(-1, 3)
        np.testing.assert_array_equal(
            palette[:5], create_pascal_label_colormap()[:5]
        )
