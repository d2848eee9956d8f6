"""deeplabv3p_tpu — TPU-native semantic-segmentation framework (JAX/XLA/Pallas).

A ground-up rebuild of the capabilities of the TF-Keras
`tf-keras-deeplabv3p-model-set` reference (mounted read-only at
/root/reference), designed TPU-first:

* models are functional Flax modules returning logits; softmax / argmax /
  resize are explicit jit-compiled functions (reference builds them into the
  Keras graph: /root/reference/deeplabv3p/model.py:51-117),
* batch-norm statistics are computed over the *global* (mesh-sharded) batch,
  so SyncBatchNormalization (reference layers.py:63-70) falls out of GSPMD
  for free — no per-replica stat hacks,
* data parallelism is a `jax.sharding.Mesh` + NamedSharding on the batch
  axis, replacing `tf.distribute.MirroredStrategy` (reference train.py:143),
* augmentation runs on device inside a jitted preprocessing graph
  (reference runs a single-threaded Python/PIL loop: data.py:55-154),
* hot post-processing (argmax, CRF message passing) are TPU kernels.
"""

__version__ = "0.1.0"

from deeplabv3p_tpu.models.factory import (  # noqa: F401
    build_deeplab_model,
    build_segmentation_model,
    DEEPLAB_MODEL_REGISTRY,
)
