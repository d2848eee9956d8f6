"""Environment shims restoring TF-2.x Keras APIs under Keras 3, so the
REFERENCE'S OWN model builders (/root/reference) can be instantiated for
provenance oracles (ADVICE r2 #4) without modifying a line of reference
code.

Each shim restores a removed/renamed API with equivalent semantics for
inference-mode parity testing:

- `KerasTensor.shape` regains `.as_list()` (TF TensorShape API; Keras 3
  returns a plain tuple) — used by reference `ASPP_block`/`Decoder_block`
  (layers.py:129,172,205) and `_inverted_res_block` (:40).
- `tensorflow.keras.layers.experimental.SyncBatchNormalization` →
  plain BatchNormalization (identical math at inference; the sync is a
  training-time cross-replica reduction) — reference layers.py:65.
- `backend.int_shape` / `backend.set_learning_phase` restored.
- `keras.utils.get_source_inputs` restored (identity on Input tensors).
- `keras_applications.imagenet_utils._obtain_input_shape` → identity on
  the explicit input_shape (its TF-1.x validation only matters for the
  imagenet-weights path, which parity tests never use).
- `DepthwiseConv2D`/`SeparableConv2D` accept `kernel_regularizer` again
  (Keras 3 renamed it depthwise_/pointwise_regularizer) — reference
  wrappers DeeplabDepthwiseConv2D / DeeplabSeparableConv2D pass the old
  name (layers.py:24-41). Regularizers don't affect forward outputs.

Call `install()` BEFORE importing any reference module; idempotent.
"""

import sys
import types


def install():
    import keras
    import tensorflow as tf
    from keras import KerasTensor

    if getattr(install, "_done", False):
        return
    install._done = True

    class _ShapeTuple(tuple):
        def as_list(self):
            return list(self)

    orig_shape = KerasTensor.shape
    KerasTensor.shape = property(
        lambda self: _ShapeTuple(orig_shape.fget(self))
    )

    K = tf.keras.backend
    if not hasattr(K, "int_shape"):
        K.int_shape = lambda t: tuple(t.shape)
    if not hasattr(K, "set_learning_phase"):
        K.set_learning_phase = lambda *_: None

    exp = types.ModuleType("tensorflow.keras.layers.experimental")
    exp.SyncBatchNormalization = tf.keras.layers.BatchNormalization
    sys.modules["tensorflow.keras.layers.experimental"] = exp

    ku = tf.keras.utils
    if not hasattr(ku, "get_source_inputs"):
        ku.get_source_inputs = lambda t: t

    ka = types.ModuleType("keras_applications")
    kai = types.ModuleType("keras_applications.imagenet_utils")

    def _obtain_input_shape(input_shape=None, default_size=None, **_kw):
        # TF-1.x behavior, minimally: explicit shape passes through;
        # None falls back to the square default (callers with an
        # input_tensor re-derive rows/cols from the tensor anyway)
        if input_shape is None and default_size:
            return (default_size, default_size, 3)
        return input_shape

    kai._obtain_input_shape = _obtain_input_shape
    # imported at module top by peleenet/ghostnet for a standalone
    # classification entry point; never part of the segmentation graph
    kai.preprocess_input = lambda x, **_kw: x
    ka.imagenet_utils = kai
    sys.modules.setdefault("keras_applications", ka)
    sys.modules.setdefault("keras_applications.imagenet_utils", kai)

    DW = tf.keras.layers.DepthwiseConv2D

    class DepthwiseConv2DCompat(DW):
        def __init__(self, *args, **kwargs):
            reg = kwargs.pop("kernel_regularizer", None)
            if reg is not None:
                kwargs["depthwise_regularizer"] = reg
            super().__init__(*args, **kwargs)

    SC = tf.keras.layers.SeparableConv2D

    class SeparableConv2DCompat(SC):
        def __init__(self, *args, **kwargs):
            reg = kwargs.pop("kernel_regularizer", None)
            if reg is not None:
                kwargs["depthwise_regularizer"] = reg
                kwargs["pointwise_regularizer"] = reg
            super().__init__(*args, **kwargs)

    # TF-2.x allowed '/' in layer names (reference: 'Predictions/Softmax',
    # MobileNetV3's 'Conv/BatchNorm', SE scopes); Keras 3 rejects them at
    # the single Operation.__init__ choke point. Sanitize with the same
    # '--' ↔ '/' convention utils/keras_import.py already uses for h5
    # interchange, so sanitized reference names equal our twins' names.
    from keras.src.ops.operation import Operation

    if not getattr(Operation.__init__, "_keras2_compat", False):
        orig_op_init = Operation.__init__

        def _op_init(self, *args, name=None, **kwargs):
            if isinstance(name, str) and "/" in name:
                name = name.replace("/", "--")
            return orig_op_init(self, *args, name=name, **kwargs)

        _op_init._keras2_compat = True
        Operation.__init__ = _op_init

    SM = tf.keras.layers.Softmax

    class SoftmaxCompat(SM):
        """Kept for direct users of the alias; name sanitizing now
        happens generically in Operation.__init__ above."""

        def __init__(self, *args, **kwargs):
            name = kwargs.get("name")
            if isinstance(name, str) and "/" in name:
                kwargs["name"] = name.replace("/", "--")
            super().__init__(*args, **kwargs)

    # `from tensorflow.keras.layers import X` resolves from the
    # sys.modules entry, which is a DIFFERENT object from the
    # `tf.keras.layers` attribute — patch every alias explicitly
    import importlib

    mods = [tf.keras.layers]
    try:
        mods.append(importlib.import_module("tensorflow.keras.layers"))
    except ImportError:
        pass
    for mod in mods:
        mod.DepthwiseConv2D = DepthwiseConv2DCompat
        mod.SeparableConv2D = SeparableConv2DCompat
        mod.Softmax = SoftmaxCompat

    ref_root = "/root/reference"
    if ref_root not in sys.path:
        sys.path.append(ref_root)
