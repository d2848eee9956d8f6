"""DeviceCachedDataset: HBM-resident feeder (data/device_cache.py).

Covers: 1-device identity/shuffle semantics, HBM-budget guard,
mesh-sharded local gather (values + shardings + no-collective layout),
from_source over both packed shards and SegmentationDataset, and a
Trainer.fit smoke over the 8-device mesh fed entirely from resident
arrays. Role model: the reference has no counterpart (its generator is
host-only, reference train.py:184-185) — this is the TPU-native input
path the packed-shard format feeds.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from deeplabv3p_tpu.data.device_cache import DeviceCachedDataset
from deeplabv3p_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.quick


def _toy(n=12, h=16, w=16, seed=0):
    rng = np.random.RandomState(seed)
    images = rng.randint(0, 256, (n, h, w, 3), dtype=np.uint8)
    labels = rng.randint(0, 21, (n, h, w), dtype=np.uint8)
    return images, labels


def test_single_device_identity_order():
    images, labels = _toy()
    ds = DeviceCachedDataset(images, labels, batch_size=4, shuffle=False)
    assert len(ds) == 3
    got_i, got_l = [], []
    for bi, bl, hw in ds.epoch_batches():
        assert bi.shape == (4, 16, 16, 3) and bi.dtype == jnp.uint8
        assert bl.shape == (4, 16, 16) and bl.dtype == jnp.uint8
        assert hw.shape == (4, 2)
        np.testing.assert_array_equal(
            np.asarray(hw), np.tile([16.0, 16.0], (4, 1))
        )
        got_i.append(np.asarray(bi))
        got_l.append(np.asarray(bl))
    np.testing.assert_array_equal(np.concatenate(got_i), images)
    np.testing.assert_array_equal(np.concatenate(got_l), labels)


def test_single_device_shuffle_covers_all_samples():
    images, labels = _toy()
    # labels encode the sample id so coverage is checkable post-shuffle
    for i in range(len(labels)):
        labels[i] = i
    ds = DeviceCachedDataset(images, labels, batch_size=4, shuffle=True)
    seen = set()
    for _, bl, _ in ds.epoch_batches():
        seen.update(np.asarray(bl)[:, 0, 0].tolist())
    assert seen == set(range(12))
    # second epoch: a different permutation (seeded rng advances)
    first = [np.asarray(bl)[:, 0, 0].tolist() for _, bl, _ in ds.epoch_batches()]
    second = [np.asarray(bl)[:, 0, 0].tolist() for _, bl, _ in ds.epoch_batches()]
    assert first != second


def test_hbm_budget_guard():
    images, labels = _toy(n=4)
    with pytest.raises(ValueError, match="HBM"):
        DeviceCachedDataset(
            images, labels, batch_size=4, hbm_limit_bytes=1024
        )


def test_mesh_local_gather_values_and_sharding():
    mesh = make_mesh(8, axis_names=("data", "spatial"), mesh_shape=(2, 4))
    images, labels = _toy(n=10, h=32, w=16)  # pads 10 -> 10 (nd=2 ok)
    ds = DeviceCachedDataset(
        images, labels, batch_size=4, mesh=mesh, shuffle=False
    )
    assert ds._local_n == 5 and len(ds) == 2
    batches = list(ds.epoch_batches())
    assert len(batches) == 2
    bi, bl, hw = batches[0]
    # identity order, per-device halves: device0 rows [0,1], device1 [5,6]
    np.testing.assert_array_equal(
        np.asarray(bi), images[[0, 1, 5, 6]]
    )
    np.testing.assert_array_equal(
        np.asarray(bl), labels[[0, 1, 5, 6]]
    )
    # outputs already in train-step batch layout -> Trainer put_fn no-ops
    from deeplabv3p_tpu.parallel.mesh import batch_arg_sharding

    assert bi.sharding.is_equivalent_to(batch_arg_sharding(mesh, 4), 4)
    assert bl.sharding.is_equivalent_to(batch_arg_sharding(mesh, 3), 3)
    assert hw.sharding.is_equivalent_to(batch_arg_sharding(mesh, 2), 2)


def test_mesh_epoch_covers_each_local_shard():
    mesh = make_mesh(8, axis_names=("data", "spatial"), mesh_shape=(2, 4))
    images, labels = _toy(n=8, h=16, w=16)
    for i in range(8):
        labels[i] = i
    ds = DeviceCachedDataset(
        images, labels, batch_size=4, mesh=mesh, shuffle=True
    )
    seen0, seen1 = set(), set()
    for _, bl, _ in ds.epoch_batches():
        ids = np.asarray(bl)[:, 0, 0]
        seen0.update(ids[:2].tolist())  # device-0 rows
        seen1.update(ids[2:].tolist())  # device-1 rows
    # per-device shuffle stays within the local shard (multi-host recipe)
    assert seen0 == {0, 1, 2, 3}
    assert seen1 == {4, 5, 6, 7}


def test_from_source_sharded_dataset(tmp_path):
    from deeplabv3p_tpu.data.shards import ShardedDataset, pack_shards

    class _Src:
        num_samples = 6
        input_shape = (16, 16)
        image_paths = [f"im{i}.jpg" for i in range(6)]

        def _load_sample(self, i):
            img = np.full((16, 16, 3), i, np.uint8)
            lbl = np.full((16, 16), i, np.uint8)
            return img, lbl, (16, 16)

    pack_shards(_Src(), str(tmp_path), shard_size=4)
    sds = ShardedDataset(str(tmp_path), batch_size=3, shuffle=False)
    ds = DeviceCachedDataset.from_source(sds, shuffle=False)
    assert ds.num_samples == 6 and ds.batch_size == 3
    bi, bl, _ = next(iter(ds.epoch_batches()))
    np.testing.assert_array_equal(np.asarray(bi)[:, 0, 0, 0], [0, 1, 2])
    np.testing.assert_array_equal(np.asarray(bl)[:, 0, 0], [0, 1, 2])


@pytest.mark.slow
def test_cli_device_cache_smoke(tmp_path):
    """`train.py --device_cache` end-to-end: toy dataset cached into
    device memory, 2 epochs, checkpoint saved."""
    import subprocess
    import sys
    import os

    from deeplabv3p_tpu.data.toy import build_overfit_dataset

    root = str(tmp_path / "ds")
    list_path = build_overfit_dataset(root, n_variants=2)
    log_dir = str(tmp_path / "logs")
    r = subprocess.run(
        [sys.executable, "train.py",
         "--model_type", "mobilenetv2_lite",
         "--dataset_path", root,
         "--dataset_file", list_path,
         "--classes_path", os.path.join(root, "classes.txt"),
         "--model_input_shape", "64",
         "--batch_size", "4",
         "--transfer_epoch", "0", "--total_epoch", "2",
         "--no_augment", "--device_cache",
         "--num_devices", "1", "--device", "cpu",
         "--log_dir", log_dir],
        capture_output=True, text=True, timeout=1200, cwd=".",
    )
    assert r.returncode == 0, (r.stderr[-4000:], r.stdout[-1000:])
    assert os.path.exists(os.path.join(log_dir, "trained_final.ckpt"))


def test_trainer_fit_from_resident_arrays():
    """Full fused train step fed by the mesh-sharded resident gather."""
    from deeplabv3p_tpu.data.augment import AugmentConfig, augment_batch
    from deeplabv3p_tpu.losses import get_loss_fn
    from deeplabv3p_tpu.models.factory import build_deeplab_model
    from deeplabv3p_tpu.train import StageConfig, Trainer

    mesh = make_mesh(8, axis_names=("data", "spatial"), mesh_shape=(2, 4))
    images, labels = _toy(n=8, h=32, w=32)
    labels %= 5
    ds = DeviceCachedDataset(images, labels, batch_size=8, mesh=mesh)
    model = build_deeplab_model("mobilenetv2_lite", 5, output_stride=16)
    cfg = AugmentConfig.identity()

    def augment_fn(key, im, lb, hw):
        return augment_batch(key, im, lb, hw, cfg, num_classes=5)

    import tempfile

    trainer = Trainer(
        model, 5, get_loss_fn("crossentropy"), mesh=mesh,
        log_dir=tempfile.mkdtemp(prefix="devcache_"),
    )
    state = trainer.fit(
        ds,
        [StageConfig(freeze_level=0, optim_type="sgd", learning_rate=1e-3,
                     epochs=1)],
        augment_fn=augment_fn,
    )
    assert state is not None
    assert np.isfinite(trainer.history[-1]["loss"])
