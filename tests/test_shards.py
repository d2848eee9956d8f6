"""Packed-shard data path (deeplabv3p_tpu/data/shards.py): pack/read
round-trip, batch protocol parity with SegmentationDataset, and the
train.py auto-detection plumbing."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from deeplabv3p_tpu.data.pipeline import SegmentationDataset
from deeplabv3p_tpu.data.shards import (
    ShardedDataset,
    is_packed_dataset,
    pack_shards,
)


@pytest.fixture()
def file_dataset(tmp_path):
    root = tmp_path / "ds"
    os.makedirs(root / "images")
    os.makedirs(root / "labels")
    rng = np.random.RandomState(0)
    ids = []
    for i in range(7):  # odd count exercises shard remainders
        Image.fromarray(
            rng.randint(0, 255, (40, 50, 3), dtype=np.uint8)
        ).save(root / "images" / f"s{i}.jpg", quality=95)
        Image.fromarray(
            rng.randint(0, 4, (40, 50), dtype=np.uint8)
        ).save(root / "labels" / f"s{i}.png")
        ids.append(f"s{i}")
    return str(root), ids


def test_pack_and_read_roundtrip(file_dataset, tmp_path):
    root, ids = file_dataset
    ds = SegmentationDataset(
        root, ids, batch_size=1, input_shape=(32, 32), augment=False,
        shuffle=False,
    )
    out = str(tmp_path / "packed")
    pack_shards(ds, out, shard_size=3)  # 7 samples -> shards of 3/3/1
    assert is_packed_dataset(out)
    meta = json.load(open(os.path.join(out, "meta.json")))
    assert meta["shard_sizes"] == [3, 3, 1]
    assert meta["ids"] == ids

    sds = ShardedDataset(out, batch_size=2, shuffle=False,
                         drop_remainder=False)
    assert sds.num_samples == 7
    assert len(sds) == 4

    # sample i from shards == decoding sample i directly
    want = [ds._load_sample(i) for i in range(7)]
    got_images, got_labels = [], []
    for images, labels, orig_hw in sds.epoch_batches():
        assert images.shape == (2, 32, 32, 3) and images.dtype == np.uint8
        assert labels.shape == (2, 32, 32) and labels.dtype == np.uint8
        assert orig_hw.shape == (2, 2)
        got_images.append(images)
        got_labels.append(labels)
    got_images = np.concatenate(got_images)
    got_labels = np.concatenate(got_labels)
    for i in range(7):
        np.testing.assert_array_equal(got_images[i], want[i][0])
        np.testing.assert_array_equal(got_labels[i], want[i][1])
    # final-batch padding is ignore-only
    assert (got_labels[7] == 255).all()


def test_sharded_shuffle_covers_all_samples(file_dataset, tmp_path):
    root, ids = file_dataset
    ds = SegmentationDataset(
        root, ids, batch_size=1, input_shape=(16, 16), augment=False,
        shuffle=False,
    )
    out = str(tmp_path / "packed")
    pack_shards(ds, out)
    sds = ShardedDataset(out, batch_size=1, shuffle=True, seed=3)
    seen = []
    for images, labels, _ in sds.epoch_batches():
        seen.append(images[0].tobytes())
    assert len(set(seen)) == 7  # every sample exactly once, any order


def test_is_packed_dataset_negative(file_dataset):
    root, _ = file_dataset
    assert not is_packed_dataset(root)


@pytest.mark.slow
def test_pack_dataset_cli_and_train(file_dataset, tmp_path):
    """pack_dataset.py CLI packs; train.py auto-detects the packed dir
    and completes an epoch from shards."""
    import subprocess
    import sys

    root, ids = file_dataset
    (tmp_path / "list.txt").write_text("\n".join(ids))
    classes = tmp_path / "classes.txt"
    classes.write_text("background\na\nb\nc")
    out = str(tmp_path / "packed")

    r = subprocess.run(
        [sys.executable, "tools/dataset_converter/pack_dataset.py",
         "--dataset_path", root,
         "--dataset_file", str(tmp_path / "list.txt"),
         "--model_input_shape", "32", "--output", out],
        capture_output=True, text=True, timeout=300, cwd=".",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert is_packed_dataset(out)

    r = subprocess.run(
        [sys.executable, "train.py",
         "--model_type", "mobilenetv2_lite",
         "--dataset_path", out,
         "--classes_path", str(classes),
         "--model_input_shape", "32",
         "--batch_size", "2",
         "--transfer_epoch", "0", "--total_epoch", "1",
         "--num_devices", "1", "--device", "cpu",
         "--log_dir", str(tmp_path / "logs")],
        capture_output=True, text=True, timeout=1200, cwd=".",
        env={**os.environ},
    )
    assert r.returncode == 0, (r.stderr[-3000:], r.stdout[-500:])
    hist = (tmp_path / "logs" / "history.jsonl").read_text().strip()
    assert hist, "no history written"
    rec = json.loads(hist.splitlines()[-1])
    assert rec["steps"] == 3  # 7 samples, batch 2, drop remainder
