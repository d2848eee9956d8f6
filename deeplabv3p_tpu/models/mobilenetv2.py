"""MobileNetV2 backbone with output-stride-aware dilation.

TPU-native re-implementation of the reference feature extractor
(/root/reference/deeplabv3p/models/deeplabv3p_mobilenetv2.py:77-199):
17 inverted-residual blocks whose strides collapse to dilation once the
requested output stride is reached, plus the skip feature at OS4
(deeplabv3p_mobilenetv2.py:116-117).

Block/channel schedule and the OS→(stride, rate) control table
(deeplabv3p_mobilenetv2.py:82-98) are preserved exactly so ImageNet /
PascalVOC checkpoints import 1:1. Keras layer names are mirrored in module
names (`Conv`, `expanded_conv_{i}_expand`, ...).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax

from deeplabv3p_tpu.models.layers import BatchNorm, DepthwiseConv, _conv
from deeplabv3p_tpu.ops.activations import relu6


def make_divisible(v: float, divisor: int, min_value: Optional[int] = None) -> int:
    """Channel rounding used by all MobileNet family backbones
    (reference deeplabv3p_mobilenetv2.py:28-35)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def os_control_table(output_stride: int) -> dict[str, int]:
    """OS → stride/dilation schedule for the two late down-sampling stages
    (reference deeplabv3p_mobilenetv2.py:82-98)."""
    if output_stride == 8:
        return dict(os16_stride=1, os16_rate=2, os32_stride=1, os32_rate=4)
    if output_stride == 16:
        return dict(os16_stride=2, os16_rate=1, os32_stride=1, os32_rate=2)
    if output_stride == 32:
        return dict(os16_stride=2, os16_rate=1, os32_stride=2, os32_rate=1)
    raise ValueError(f"invalid output stride {output_stride}")


class InvertedResBlock(nn.Module):
    """MobileNetV2 inverted residual (reference _inverted_res_block,
    deeplabv3p_mobilenetv2.py:38-74): optional 1x1 expand → 3x3 depthwise
    (stride/dilation) → 1x1 linear project, with identity skip."""

    expansion: int
    stride: int
    alpha: float
    filters: int
    block_id: int
    skip_connection: bool
    rate: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, inputs: jax.Array, train: bool = False) -> jax.Array:
        in_channels = inputs.shape[-1]
        pointwise_filters = make_divisible(int(self.filters * self.alpha), 8)
        x = inputs
        prefix = f"expanded_conv_{self.block_id}_" if self.block_id else "expanded_conv_"

        if self.block_id:
            x = _conv(
                self.expansion * in_channels, 1,
                name=prefix + "expand", dtype=self.dtype,
            )(x)
            x = BatchNorm(
                epsilon=1e-3, momentum=0.999, dtype=self.dtype,
                name=prefix + "expand_BN",
            )(x, train=train)
            x = relu6(x)

        x = DepthwiseConv(
            kernel_size=3, strides=self.stride, rate=self.rate,
            dtype=self.dtype, name=prefix + "depthwise",
        )(x)
        x = BatchNorm(
            epsilon=1e-3, momentum=0.999, dtype=self.dtype,
            name=prefix + "depthwise_BN",
        )(x, train=train)
        x = relu6(x)

        x = _conv(pointwise_filters, 1, name=prefix + "project", dtype=self.dtype)(x)
        x = BatchNorm(
            epsilon=1e-3, momentum=0.999, dtype=self.dtype,
            name=prefix + "project_BN",
        )(x, train=train)

        if self.skip_connection:
            x = x + inputs
        return x


class MobileNetV2Body(nn.Module):
    """Feature extractor returning (features, skip@OS4).

    Mirrors reference MobileNetV2_body (deeplabv3p_mobilenetv2.py:77-199)
    minus the Keras no-top expansion used only for weight download.
    """

    output_stride: int = 16
    alpha: float = 1.0
    dtype: Optional[Any] = None
    # checkpoint each inverted-residual block (jax.checkpoint per block):
    # the bwd replays one block at a time instead of storing all block
    # activations — finer-grained and compile-friendlier than wrapping
    # the whole backbone in one remat (factory remat='full')
    remat_blocks: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> tuple[jax.Array, jax.Array]:
        tab = os_control_table(self.output_stride)
        alpha = self.alpha
        dt = self.dtype

        first_filters = make_divisible(32 * alpha, 8)
        x = _conv(first_filters, 3, strides=2, name="Conv", dtype=dt)(x)
        x = BatchNorm(epsilon=1e-3, momentum=0.999, dtype=dt, name="Conv_BN")(
            x, train=train
        )
        x = relu6(x)

        block_cls = InvertedResBlock
        if self.remat_blocks:
            # static_argnums: (module, x, train) — train is compile-time
            block_cls = nn.remat(InvertedResBlock, static_argnums=(2,))

        def block(x, filters, stride, expansion, block_id, skip, rate=1):
            return block_cls(
                expansion=expansion, stride=stride, alpha=alpha, filters=filters,
                block_id=block_id, skip_connection=skip, rate=rate, dtype=dt,
                name=f"block_{block_id}",
            )(x, train)

        x = block(x, 16, 1, 1, 0, False)
        x = block(x, 24, 2, 6, 1, False)
        x = block(x, 24, 1, 6, 2, True)
        skip = x  # OS4 skip feature (reference :116-117)

        x = block(x, 32, 2, 6, 3, False)
        x = block(x, 32, 1, 6, 4, True)
        x = block(x, 32, 1, 6, 5, True)

        # Native OS16 stage — stride/dilation controlled (reference :127-141)
        x = block(x, 64, tab["os16_stride"], 6, 6, False)
        x = block(x, 64, 1, 6, 7, True, rate=tab["os16_rate"])
        x = block(x, 64, 1, 6, 8, True, rate=tab["os16_rate"])
        x = block(x, 64, 1, 6, 9, True, rate=tab["os16_rate"])
        x = block(x, 96, 1, 6, 10, False, rate=tab["os16_rate"])
        x = block(x, 96, 1, 6, 11, True, rate=tab["os16_rate"])
        x = block(x, 96, 1, 6, 12, True, rate=tab["os16_rate"])

        # Native OS32 stage (reference :144-152)
        x = block(x, 160, tab["os32_stride"], 6, 13, False, rate=tab["os16_rate"])
        x = block(x, 160, 1, 6, 14, True, rate=tab["os32_rate"])
        x = block(x, 160, 1, 6, 15, True, rate=tab["os32_rate"])
        x = block(x, 320, 1, 6, 16, False, rate=tab["os32_rate"])

        return x, skip
