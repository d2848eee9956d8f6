"""Modified Aligned Xception backbone (DeepLabV3+ flagship).

TPU-native rebuild of the reference feature extractor
(/root/reference/deeplabv3p/models/deeplabv3p_xception.py:96-163):
entry flow (2 convs + 3 blocks), 16 middle-flow units, exit flow
(2 blocks), with the OS→(stride, dilation) table at :101-117 and the OS4
skip taken after entry_flow_block2's second separable conv (:133-135,
via `_xception_block(..., return_skip=True)` at :78-79).

Design notes: each `_xception_block` is three SepConv+BN with an optional
conv/sum shortcut; strided shortcut convs use the input-size-independent
explicit padding of `_conv2d_same` (:25-54) so checkpoints transfer
bit-exact. The 16 middle-flow units share one structure — expressed as a
Python loop that unrolls at trace time into one fused XLA program.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax

from deeplabv3p_tpu.models.layers import BatchNorm, SepConvBN, _conv
from deeplabv3p_tpu.models.mobilenetv2 import os_control_table
from deeplabv3p_tpu.ops.conv import atrous_explicit_pad


def conv2d_same(
    x: jax.Array, filters: int, name: str, *, stride: int = 1,
    kernel_size: int = 3, rate: int = 1, dtype=None, parent=None,
) -> jax.Array:
    """Input-size-independent 'same' conv (reference _conv2d_same,
    deeplabv3p_xception.py:25-54): TF-SAME when stride==1, else explicit
    effective-kernel padding + VALID."""
    padding: Any = (
        "SAME" if stride == 1 else atrous_explicit_pad(kernel_size, rate)
    )
    return _conv(
        filters, kernel_size, strides=stride, rate=rate, padding=padding,
        name=name, dtype=dtype,
    )(x)


class XceptionBlock(nn.Module):
    """3x SepConv_BN + {conv|sum|none} shortcut (reference
    _xception_block, deeplabv3p_xception.py:57-93)."""

    depth_list: Sequence[int]
    skip_connection_type: str  # 'conv' | 'sum' | 'none'
    stride: int
    rate: int = 1
    depth_activation: bool = False
    return_skip: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, inputs: jax.Array, train: bool = False):
        residual = inputs
        skip = None
        for i in range(3):
            residual = SepConvBN(
                self.depth_list[i],
                stride=self.stride if i == 2 else 1,
                rate=self.rate,
                depth_activation=self.depth_activation,
                dtype=self.dtype,
                name=f"separable_conv{i + 1}",
            )(residual, train=train)
            if i == 1:
                skip = residual

        if self.skip_connection_type == "conv":
            shortcut = conv2d_same(
                inputs, self.depth_list[-1], "shortcut",
                kernel_size=1, stride=self.stride, dtype=self.dtype,
            )
            shortcut = BatchNorm(dtype=self.dtype, name="shortcut_BN")(
                shortcut, train=train
            )
            outputs = residual + shortcut
        elif self.skip_connection_type == "sum":
            outputs = residual + inputs
        else:
            outputs = residual

        if self.return_skip:
            return outputs, skip
        return outputs


class XceptionBody(nn.Module):
    """Returns (features@OS, skip@OS4) (reference Xception_body,
    deeplabv3p_xception.py:96-163)."""

    output_stride: int = 16
    dtype: Optional[Any] = None
    # checkpoint each XceptionBlock (factory remat='block'): the bwd
    # replays one block at a time instead of storing all 21 blocks'
    # activations — the train step is HBM-bound (ROUND3_NOTES roofline),
    # so dropping saved-activation traffic can pay even though it
    # re-spends FLOPs the idle MXU has to spare
    remat_blocks: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        tab = os_control_table(self.output_stride)
        dt = self.dtype
        block_cls = XceptionBlock
        if self.remat_blocks:
            # static_argnums: (module, x, train) — train is compile-time
            block_cls = nn.remat(XceptionBlock, static_argnums=(2,))

        x = _conv(32, 3, strides=2, name="entry_flow_conv1_1", dtype=dt)(x)
        x = BatchNorm(dtype=dt, name="entry_flow_conv1_1_BN")(x, train)
        x = nn.relu(x)
        x = conv2d_same(x, 64, "entry_flow_conv1_2", kernel_size=3, stride=1, dtype=dt)
        x = BatchNorm(dtype=dt, name="entry_flow_conv1_2_BN")(x, train)
        x = nn.relu(x)

        x = block_cls(
            [128, 128, 128], "conv", stride=2, dtype=dt,
            name="entry_flow_block1",
        )(x, train)
        x, skip = block_cls(
            [256, 256, 256], "conv", stride=2, return_skip=True, dtype=dt,
            name="entry_flow_block2",
        )(x, train)

        # native OS16 stage (reference :138-144)
        x = block_cls(
            [728, 728, 728], "conv", stride=tab["os16_stride"], dtype=dt,
            name="entry_flow_block3",
        )(x, train)
        for i in range(16):
            x = block_cls(
                [728, 728, 728], "sum", stride=1, rate=tab["os16_rate"],
                dtype=dt, name=f"middle_flow_unit_{i + 1}",
            )(x, train)

        # native OS32 stage (reference :147-152)
        x = block_cls(
            [728, 1024, 1024], "conv", stride=tab["os32_stride"],
            rate=tab["os16_rate"], dtype=dt, name="exit_flow_block1",
        )(x, train)
        x = block_cls(
            [1536, 1536, 2048], "none", stride=1, rate=tab["os32_rate"],
            depth_activation=True, dtype=dt, name="exit_flow_block2",
        )(x, train)
        return x, skip
