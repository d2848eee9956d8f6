"""Device-mesh parallelism: data-parallel sharding over ICI.

Replaces the reference's `tf.distribute.MirroredStrategy` + NCCL
(/root/reference/train.py:143-158) with a `jax.sharding.Mesh`: the batch is
sharded over the 'data' axis, parameters are replicated, and XLA inserts
gradient psums and cross-replica BN-stat reductions automatically (GSPMD).
"""

from deeplabv3p_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_arg_sharding,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
