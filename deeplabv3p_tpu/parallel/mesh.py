"""Mesh construction and sharding helpers.

Design (SURVEY.md §2.4): the reference's only parallelism is data-parallel
MirroredStrategy with NCCL all-reduce plus SyncBatchNorm. The TPU-native
equivalent: a 1-D 'data' mesh; `jit`-compiled train steps with the batch
sharded over 'data' and parameters replicated. Gradient all-reduce and
global-batch BN statistics are inserted by XLA (riding ICI within a slice,
DCN across slices) — no user-level collective code.

Beyond parity, a 2-D ('data', 'spatial') mesh adds SPATIAL PARTITIONING —
the convnet analogue of sequence parallelism: the image height dimension
is sharded across the 'spatial' axis and GSPMD inserts halo exchanges for
the conv windows (neighbour ppermutes over ICI) and all-gathers where a
resize genuinely needs cross-shard rows. That scales a single
high-resolution image (e.g. 2048x1024 Cityscapes) across chips when the
per-chip batch is already 1 — model math is UNCHANGED (BN statistics are
means over (N, H, W), so sharding H is as exact as sharding N; verified
numerically in tests/test_parallel.py).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _auto_shape(n: int, n_axes: int) -> tuple[int, ...]:
    """Default (data, spatial) factorization: spatial gets the largest
    power of two dividing n, capped at 4 — halo-exchange overhead grows
    with the spatial axis, so favour the batch axis."""
    if n_axes == 1:
        return (n,)
    spatial = 1
    while spatial < 4 and n % (spatial * 2) == 0:
        spatial *= 2
    return (n // spatial, spatial)


def make_mesh(
    num_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[Any]] = None,
    mesh_shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a device mesh.

    1-D data-parallel by default (the reference's `--gpu_num N` becomes
    `make_mesh(N)`). Pass `axis_names=("data", "spatial")` for the 2-D
    data x spatial-partitioning mesh; `mesh_shape` picks the
    factorization (defaults to spatial = largest power of 2 dividing N,
    capped at 4).
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = _auto_shape(n, len(axis_names))
    if len(mesh_shape) != len(axis_names):
        raise ValueError(f"mesh_shape {mesh_shape} vs axes {axis_names}")
    if int(np.prod(mesh_shape)) != n:
        raise ValueError(f"mesh_shape {mesh_shape} != {n} devices")
    return Mesh(
        np.asarray(devices).reshape(tuple(mesh_shape)), tuple(axis_names)
    )


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the mesh."""
    return NamedSharding(mesh, P(axis))


def batch_arg_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Sharding for one train-step batch argument by rank.

    On a ('data', 'spatial') mesh, image-like args (rank >= 3: NHW[C])
    shard batch over 'data' AND height over 'spatial'; low-rank args
    (e.g. per-sample (B, 2) original sizes) shard batch only. On a 1-D
    mesh this degrades to plain batch sharding.
    """
    if "spatial" in mesh.axis_names and ndim >= 3:
        return NamedSharding(mesh, P("data", "spatial"))
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a host batch, each leaf sharded by its rank
    (batch axis over 'data'; height over 'spatial' when present)."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_arg_sharding(mesh, np.ndim(x))),
        batch,
    )
