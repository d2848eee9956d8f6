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
    with pytest.raises(NotImplementedError):
        make_mesh(axis_names=("data", "model"))


def test_shard_batch_places_leading_axis():
    mesh = make_mesh(8)
    batch = (np.zeros((16, 4, 4, 3), np.float32), np.zeros((16, 4, 4), np.int32))
    images, labels = shard_batch(mesh, batch)
    assert images.sharding == batch_sharding(mesh)
    assert labels.sharding == batch_sharding(mesh)
    # each device holds 16/8 = 2 samples
    shard = images.addressable_shards[0]
    assert shard.data.shape[0] == 2


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
    stage = StageConfig(freeze_level=0, optim_type="sgd",
                        learning_rate=1e-2, epochs=1)

    rng = np.random.RandomState(0)
    images = rng.rand(8, 32, 32, 3).astype(np.float32) * 2 - 1
    labels = rng.randint(0, 4, size=(8, 32, 32)).astype(np.int32)
    weights = np.ones((8, 32, 32), np.float32)

    results = {}
    for n_dev in (8, 1):
        trainer = Trainer(
            model, 4, loss_fn, mesh=make_mesh(n_dev),
            log_dir=str(tmp_path / f"logs{n_dev}"), seed=0,
        )
        state, tx = trainer.init_state((32, 32), stage, batch_size=8)
        step = trainer.compile_train_step(tx, stage)
        state, metrics = step(
            state, jnp.asarray(images), jnp.asarray(labels),
            jnp.asarray(weights), 1.0,
        )
        results[n_dev] = (
            jax.device_get(state.params),
            jax.device_get(state.batch_stats),
            float(metrics["loss"]),
            float(metrics["jaccard"]),
        )

    p8, s8, loss8, jac8 = results[8]
    p1, s1, loss1, jac1 = results[1]

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
    # divergence; fp reassociation through the BN chain measures ≤1e-3.
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(p8)[0],
        jax.tree_util.tree_flatten_with_path(p1)[0],
    ):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-3,
            err_msg=f"params diverged at {jax.tree_util.keystr(pa)}",
        )
