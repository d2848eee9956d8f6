"""Core TPU-friendly ops: convolution padding helpers, resize, activations."""

from deeplabv3p_tpu.ops.resize import resize, resize_bilinear, resize_nearest  # noqa: F401
from deeplabv3p_tpu.ops.activations import relu6, hard_sigmoid, hard_swish  # noqa: F401
from deeplabv3p_tpu.ops.conv import same_pad_explicit, atrous_explicit_pad  # noqa: F401
