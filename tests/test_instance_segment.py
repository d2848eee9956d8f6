"""Tests for the instance-segmentation converters
(tools/dataset_converter/instance_segment/, VERDICT round-1 item #7) on
tiny synthetic COCO/SBD fixtures."""

import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.dataset_converter.instance_segment import coco_mask  # noqa: E402


# ---------------------------------------------------------------------------
# RLE codec
# ---------------------------------------------------------------------------

def test_rle_counts_fortran_order():
    mask = np.array([[1, 0], [0, 1]], np.uint8)
    # column-major scan: 1,0,0,1 → runs: 0 zeros, 1 one, 2 zeros, 1 one
    assert coco_mask.mask_to_rle_counts(mask) == [0, 1, 2, 1]


def test_rle_mask_roundtrip_random():
    rng = np.random.RandomState(0)
    for shape in [(1, 1), (7, 5), (32, 33), (64, 64)]:
        mask = (rng.rand(*shape) > 0.5).astype(np.uint8)
        rle = coco_mask.encode(mask)
        assert isinstance(rle["counts"], str)
        np.testing.assert_array_equal(coco_mask.decode(rle), mask)


def test_rle_string_codec_known_values():
    """Varint string codec: negative deltas and >5-bit values must
    round-trip (the delta encoding goes negative whenever run i is shorter
    than run i-2)."""
    for counts in [[0, 1, 2, 1], [5], [100, 3, 1000, 2, 7],
                   [0, 4096, 17, 4096, 1]]:
        s = coco_mask.rle_counts_to_string(counts)
        assert coco_mask.rle_string_to_counts(s) == counts


def test_uncompressed_rle_decode():
    rle = {"size": [2, 2], "counts": [0, 1, 2, 1]}
    np.testing.assert_array_equal(
        coco_mask.decode(rle), np.array([[1, 0], [0, 1]], np.uint8)
    )


def test_polygons_to_mask_square():
    mask = coco_mask.polygons_to_mask([[1, 1, 4, 1, 4, 4, 1, 4]], 6, 6)
    assert mask[2, 2] == 1 and mask[1, 1] == 1 and mask[4, 4] == 1
    assert mask[0, 0] == 0 and mask[5, 5] == 0


def test_mask_to_bbox():
    mask = np.zeros((10, 12), np.uint8)
    mask[2:5, 3:9] = 1
    assert coco_mask.mask_to_bbox(mask) == (3, 2, 8, 4)


def test_convert_coco_category_alignment():
    from tools.dataset_converter.instance_segment.coco_annotation import (
        convert_coco_category,
    )

    # endpoints of every branch in the reference table
    # (coco_annotation.py:45-67)
    expected = {1: 0, 11: 10, 13: 11, 25: 23, 27: 24, 28: 25, 31: 26,
                44: 39, 46: 40, 65: 59, 67: 60, 70: 61, 72: 62, 82: 72,
                84: 73, 90: 79}
    for cid, want in expected.items():
        assert convert_coco_category(cid) == want, cid
    # the full standard mapping must be a bijection onto 0..79
    valid = [c for c in range(1, 91)
             if c not in (12, 26, 29, 30, 45, 66, 68, 69, 71, 83)]
    mapped = [convert_coco_category(c) for c in valid]
    assert sorted(mapped) == list(range(80))


# ---------------------------------------------------------------------------
# COCO json → PNG + txt converter
# ---------------------------------------------------------------------------

@pytest.fixture()
def tiny_coco(tmp_path):
    """2-image COCO dataset: one polygon instance + one RLE instance on
    image 1, one instance on image 2. Standard category ids 1 (person)
    and 2 (dog) — a customize_coco-style json with continuous 1-based ids
    (a standard-COCO json carries the full 80-category table; id
    re-alignment for that case is covered by
    test_convert_coco_category_alignment)."""
    m2 = np.zeros((8, 10), np.uint8)
    m2[5:8, 6:9] = 1
    data = {
        "images": [
            {"id": 1, "file_name": "img_a.jpg", "height": 8, "width": 10},
            {"id": 2, "file_name": "img_b.jpg", "height": 6, "width": 6},
        ],
        "categories": [
            {"supercategory": "none", "id": 1, "name": "person"},
            {"supercategory": "none", "id": 2, "name": "dog"},
        ],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1, "iscrowd": 0,
             "segmentation": [[1, 1, 4, 1, 4, 4, 1, 4]],
             "area": 16.0, "bbox": [1, 1, 3, 3]},
            {"id": 2, "image_id": 1, "category_id": 2, "iscrowd": 0,
             "segmentation": coco_mask.encode(m2),
             "area": float(m2.sum()), "bbox": [6, 5, 2, 2]},
            {"id": 3, "image_id": 2, "category_id": 1, "iscrowd": 0,
             "segmentation": [[0, 0, 3, 0, 3, 3, 0, 3]],
             "area": 16.0, "bbox": [0, 0, 3, 3]},
        ],
    }
    json_path = tmp_path / "instances_tiny.json"
    with open(json_path, "w") as f:
        json.dump(data, f)
    classes_path = tmp_path / "classes.txt"
    # selected classes: person=0, dog=1 in the target list
    classes_path.write_text("person\ndog\n")
    return str(json_path), str(classes_path), m2


def test_coco_annotation_convert(tiny_coco, tmp_path):
    from tools.dataset_converter.instance_segment.coco_annotation import (
        coco_annotation,
    )

    json_path, classes_path, m2 = tiny_coco
    out = str(tmp_path / "out")
    stats = coco_annotation(json_path, out, classes_path,
                            customize_coco=True)
    assert stats["num_images"] == 2
    assert stats["class_count"] == {"person": 2, "dog": 1}
    assert stats["max_instances"] == 2

    lines = open(os.path.join(out, "instances_tiny.txt")).read().splitlines()
    assert lines[0] == "img_a 1,1,4,4,0 6,5,8,7,1"
    assert lines[1] == "img_b 0,0,3,3,0"

    lbl = np.array(Image.open(os.path.join(out, "labels", "img_a.png")))
    assert lbl.shape == (8, 10)
    assert set(np.unique(lbl)) == {0, 1, 2}
    # instance 1 = polygon square, instance 2 = RLE block
    assert lbl[2, 2] == 1
    np.testing.assert_array_equal(lbl[5:8, 6:9], 2 * np.ones((3, 3)))

    lbl_b = np.array(Image.open(os.path.join(out, "labels", "img_b.png")))
    assert set(np.unique(lbl_b)) == {0, 1}


def test_coco_annotation_overlap_keeps_first(tmp_path):
    """Overlapping instances: earlier annotation wins (label==0 guard,
    reference coco_annotation.py:179-182)."""
    from tools.dataset_converter.instance_segment.coco_annotation import (
        coco_annotation,
    )

    data = {
        "images": [{"id": 1, "file_name": "x.jpg", "height": 6, "width": 6}],
        "categories": [{"supercategory": "none", "id": 1, "name": "person"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1, "iscrowd": 0,
             "segmentation": [[0, 0, 4, 0, 4, 4, 0, 4]], "area": 25.0,
             "bbox": [0, 0, 4, 4]},
            {"id": 2, "image_id": 1, "category_id": 1, "iscrowd": 0,
             "segmentation": [[2, 2, 5, 2, 5, 5, 2, 5]], "area": 16.0,
             "bbox": [2, 2, 3, 3]},
        ],
    }
    jp = tmp_path / "instances_ov.json"
    with open(jp, "w") as f:
        json.dump(data, f)
    out = str(tmp_path / "out")
    coco_annotation(str(jp), out)
    lbl = np.array(Image.open(os.path.join(out, "labels", "x.png")))
    assert lbl[3, 3] == 1  # overlap region belongs to instance 1
    assert lbl[5, 5] == 2


# ---------------------------------------------------------------------------
# SBD .mat converters
# ---------------------------------------------------------------------------

@pytest.fixture()
def tiny_sbd(tmp_path):
    """SBD-layout dataset: 2 images with GTinst .mat files (written via
    scipy.io.savemat; dicts become MATLAB structs)."""
    import scipy.io

    root = tmp_path / "sbd"
    os.makedirs(root / "img")
    os.makedirs(root / "inst")

    seg1 = np.zeros((8, 9), np.uint8)
    seg1[1:4, 1:5] = 1  # instance 1: aeroplane (class 1)
    seg1[5:8, 4:8] = 2  # instance 2: person (class 15)
    seg2 = np.zeros((5, 7), np.uint8)
    seg2[2:5, 0:3] = 1  # single instance: dog (class 12)

    scipy.io.savemat(root / "inst" / "a.mat", {
        "GTinst": {"Segmentation": seg1,
                   "Categories": np.array([1.0, 15.0]),
                   "Boundaries": np.zeros((1, 1))}
    })
    scipy.io.savemat(root / "inst" / "b.mat", {
        "GTinst": {"Segmentation": seg2,
                   "Categories": 12.0,  # scalar: single instance
                   "Boundaries": np.zeros((1, 1))}
    })
    rng = np.random.RandomState(0)
    Image.fromarray(
        rng.randint(0, 255, (8, 9, 3), np.uint8)
    ).save(root / "img" / "a.jpg")
    Image.fromarray(
        rng.randint(0, 255, (5, 7, 3), np.uint8)
    ).save(root / "img" / "b.jpg")
    (root / "val.txt").write_text("a\nb\n")
    (root / "train.txt").write_text("a\n")
    return str(root), seg1, seg2


def test_voc_sbd_annotation(tiny_sbd, tmp_path):
    from tools.dataset_converter.instance_segment.voc_sbd_annotation import (
        voc_sbd_annotation,
    )

    root, seg1, seg2 = tiny_sbd
    out = str(tmp_path / "out")
    stats = voc_sbd_annotation(root, out, sets=("val",))
    assert stats["val"]["num_images"] == 2
    assert stats["val"]["max_instances"] == 2
    cc = stats["val"]["class_count"]
    assert cc["aeroplane"] == 1 and cc["person"] == 1 and cc["dog"] == 1

    lines = open(os.path.join(out, "val.txt")).read().splitlines()
    assert lines[0] == "a 1,1,4,3,0 4,5,7,7,14"
    assert lines[1] == "b 0,2,2,4,11"
    lbl = np.array(Image.open(os.path.join(out, "labels", "a.png")))
    np.testing.assert_array_equal(lbl, seg1)


def test_voc_sbd_to_coco_roundtrip(tiny_sbd, tmp_path):
    """SBD → COCO json → MiniCOCO decode must reproduce the instance
    masks exactly (locks the RLE encoder against the reader)."""
    from tools.dataset_converter.instance_segment.voc_sbd_to_coco import (
        voc_sbd_to_coco,
    )

    root, seg1, seg2 = tiny_sbd
    out = str(tmp_path / "coco")
    written = voc_sbd_to_coco(root, out, sets=("val",))
    assert written == [
        os.path.join(out, "instances_pascal_sbd_val2012.json")
    ]
    coco = coco_mask.MiniCOCO(written[0])
    assert len(coco.imgs) == 2 and len(coco.anns) == 3
    assert [c["name"] for c in coco.loadCats(coco.getCatIds())][0] == "aeroplane"

    anns1 = coco.loadAnns(coco.getAnnIds(imgIds=1))
    assert [a["category_id"] for a in anns1] == [1, 15]
    np.testing.assert_array_equal(
        coco.annToMask(anns1[0]), (seg1 == 1).astype(np.uint8)
    )
    np.testing.assert_array_equal(
        coco.annToMask(anns1[1]), (seg1 == 2).astype(np.uint8)
    )
    assert anns1[0]["bbox"] == [1, 1, 3, 2]

    anns2 = coco.loadAnns(coco.getAnnIds(imgIds=2))
    assert anns2[0]["category_id"] == 12
    np.testing.assert_array_equal(
        coco.annToMask(anns2[0]), (seg2 == 1).astype(np.uint8)
    )


# ---------------------------------------------------------------------------
# Visualizers
# ---------------------------------------------------------------------------

def test_instance_segment_visualize(tiny_coco, tmp_path):
    from tools.dataset_converter.instance_segment.coco_annotation import (
        coco_annotation,
    )
    from tools.dataset_converter.instance_segment.instance_segment_visualize import (
        instance_segment_visualize,
    )

    json_path, classes_path, _ = tiny_coco
    ds = str(tmp_path / "ds")
    coco_annotation(json_path, ds, classes_path, customize_coco=True)
    # converter writes labels/; add the images/ side
    os.makedirs(os.path.join(ds, "images"))
    rng = np.random.RandomState(0)
    for stem, (h, w) in [("img_a", (8, 10)), ("img_b", (6, 6))]:
        Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(
            os.path.join(ds, "images", stem + ".jpg")
        )
    out = str(tmp_path / "viz")
    n = instance_segment_visualize(
        os.path.join(ds, "instances_tiny.txt"), ds, classes_path, out
    )
    assert n == 2
    assert sorted(os.listdir(out)) == ["img_a.jpg", "img_b.jpg"]
    arr = np.array(Image.open(os.path.join(out, "img_a.jpg")))
    assert arr.shape == (8, 10, 3)


def test_coco_visualize(tiny_coco, tmp_path):
    from tools.dataset_converter.instance_segment.coco_visualize import (
        coco_visualize,
    )

    json_path, classes_path, _ = tiny_coco
    img_dir = str(tmp_path / "imgs")
    os.makedirs(img_dir)
    rng = np.random.RandomState(0)
    for stem, (h, w) in [("img_a", (8, 10)), ("img_b", (6, 6))]:
        Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(
            os.path.join(img_dir, stem + ".jpg")
        )
    out = str(tmp_path / "viz")
    n = coco_visualize(img_dir, json_path, out, customize_coco=True)
    assert n == 2
    assert sorted(os.listdir(out)) == ["img_a.jpg", "img_b.jpg"]


def test_voc_visualize(tmp_path):
    from tools.dataset_converter.instance_segment.voc_visualize import (
        voc_visualize,
    )

    root = tmp_path / "voc"
    for d in ("Annotations", "JPEGImages", "SegmentationObject"):
        os.makedirs(root / d)
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (10, 12, 3), np.uint8)).save(
        root / "JPEGImages" / "0001.jpg"
    )
    seg = np.zeros((10, 12), np.uint8)
    seg[2:5, 3:9] = 1
    Image.fromarray(seg, mode="P").save(
        root / "SegmentationObject" / "0001.png"
    )
    (root / "Annotations" / "0001.xml").write_text(
        "<annotation><object><name>dog</name><bndbox>"
        "<xmin>3</xmin><ymin>2</ymin><xmax>8</xmax><ymax>4</ymax>"
        "</bndbox></object></annotation>"
    )
    lst = tmp_path / "ids.txt"
    lst.write_text("0001\n")
    out = str(tmp_path / "viz")
    assert voc_visualize(str(lst), str(root), out) == 1
    assert os.listdir(out) == ["0001.jpg"]
