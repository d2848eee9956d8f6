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
