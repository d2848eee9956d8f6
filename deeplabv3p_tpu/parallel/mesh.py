"""Mesh construction and sharding helpers.

Design (SURVEY.md §2.4): the reference's only parallelism is data-parallel
MirroredStrategy with NCCL all-reduce plus SyncBatchNorm. The TPU-native
equivalent: a 1-D 'data' mesh; `jit`-compiled train steps with the batch
sharded over 'data' and parameters replicated. Gradient all-reduce and
global-batch BN statistics are inserted by XLA (riding ICI within a slice,
DCN across slices) — no user-level collective code.

A 2-D ('data', 'model') mesh constructor is provided for future tensor
parallelism; the reference needs none (SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Build a device mesh. 1-D data-parallel by default (the reference's
    `--gpu_num N` becomes `make_mesh(N)`)."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    if len(axis_names) != 1:
        raise NotImplementedError(
            "the reference requires only data parallelism (SURVEY.md §2.4); "
            "multi-axis meshes land with tensor-parallel backbones"
        )
    return Mesh(np.asarray(devices), axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis: str = "data") -> Any:
    """Device-put a host batch with its leading axis sharded over the mesh."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
