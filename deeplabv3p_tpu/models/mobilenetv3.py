"""MobileNetV3 Large/Small backbones with SE blocks and hard-swish.

TPU-native rebuild of the reference feature extractors
(/root/reference/deeplabv3p/models/deeplabv3p_mobilenetv3.py):
stem 16ch 3x3/2 (:343-355), inverted residual blocks with optional
squeeze-excite and relu/hard-swish choice (:149-201), SE block with
hard-sigmoid gate (:122-146), and the per-variant stack schedules with OS
stride/dilation control — Small (:469-505) and Large (:556-600). The body
output is the last block's feature (before the classifier Conv_1,
reference :357-359 `final_feature = x`).

Skip features: Large takes OS4 after block 2 (:564-566); Small after
block 0 (:474-476, which is OS4 because Small's stem+block0 both stride).

Module names encode Keras '/'-scoped names with '--'
(see utils/keras_import.keras_layer_name).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from deeplabv3p_tpu.models.layers import BatchNorm, DepthwiseConv, _conv
from deeplabv3p_tpu.models.mobilenetv2 import make_divisible, os_control_table
from deeplabv3p_tpu.ops.activations import hard_sigmoid, hard_swish

_depth = make_divisible  # reference _depth (:112-120) == _make_divisible


class SEBlock(nn.Module):
    """Squeeze-excite with ReLU bottleneck + hard-sigmoid gate
    (reference _se_block, :122-146)."""

    filters: int  # channels the SE was built for (expanded channels)
    se_ratio: float = 0.25
    prefix: str = ""
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        squeezed = jnp.mean(x, axis=(1, 2), keepdims=True)
        squeezed = _conv(
            _depth(int(self.filters * self.se_ratio), 8), 1, use_bias=True,
            name=self.prefix + "squeeze_excite--Conv", dtype=self.dtype,
        )(squeezed)
        squeezed = nn.relu(squeezed)
        squeezed = _conv(
            self.filters, 1, use_bias=True,
            name=self.prefix + "squeeze_excite--Conv_1", dtype=self.dtype,
        )(squeezed)
        return x * hard_sigmoid(squeezed)


class InvertedResBlockV3(nn.Module):
    """MNv3 inverted residual (reference _inverted_res_block, :149-201)."""

    expansion: float
    filters: int
    kernel_size: int
    stride: int
    se_ratio: Optional[float]
    activation: Callable[[jax.Array], jax.Array]
    block_id: int
    skip_connection: bool = False
    rate: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        shortcut = x
        infilters = x.shape[-1]
        prefix = (
            f"expanded_conv_{self.block_id}--" if self.block_id
            else "expanded_conv--"
        )
        dt = self.dtype

        if self.block_id:
            x = _conv(
                _depth(infilters * self.expansion, 8), 1,
                name=prefix + "expand", dtype=dt,
            )(x)
            x = BatchNorm(
                epsilon=1e-3, momentum=0.999, dtype=dt,
                name=prefix + "expand--BatchNorm",
            )(x, train=train)
            x = self.activation(x)

        x = DepthwiseConv(
            kernel_size=self.kernel_size, strides=self.stride, rate=self.rate,
            dtype=dt, name=prefix + "depthwise--Conv",
        )(x)
        x = BatchNorm(
            epsilon=1e-3, momentum=0.999, dtype=dt,
            name=prefix + "depthwise--BatchNorm",
        )(x, train=train)
        x = self.activation(x)

        if self.se_ratio:
            x = SEBlock(
                _depth(infilters * self.expansion, 8), self.se_ratio,
                prefix=prefix, dtype=dt, name=f"se_{self.block_id}",
            )(x)

        x = _conv(self.filters, 1, name=prefix + "project", dtype=dt)(x)
        x = BatchNorm(
            epsilon=1e-3, momentum=0.999, dtype=dt,
            name=prefix + "project--BatchNorm",
        )(x, train=train)

        if self.skip_connection:
            x = x + shortcut
        return x


class _MobileNetV3Body(nn.Module):
    """Shared stem + per-variant stack (reference MobileNetV3, :204-432)."""

    variant: str = "large"  # 'large' | 'small'
    output_stride: int = 16
    alpha: float = 1.0
    minimalistic: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        tab = os_control_table(self.output_stride)
        dt = self.dtype
        if self.minimalistic:
            kernel, activation, se_ratio = 3, nn.relu, None
        else:
            kernel, activation, se_ratio = 5, hard_swish, 0.25

        def depth(d):
            return _depth(d * self.alpha, 8)

        # stem: correct_pad + VALID == TF-SAME for 3x3/2 (reference :343-355)
        x = _conv(16, 3, strides=2, name="Conv", dtype=dt)(x)
        x = BatchNorm(
            epsilon=1e-3, momentum=0.999, dtype=dt, name="Conv--BatchNorm"
        )(x, train=train)
        x = activation(x)

        def block(x, expansion, filters, k, stride, se, act, bid, skip, rate=1):
            return InvertedResBlockV3(
                expansion=expansion, filters=filters, kernel_size=k,
                stride=stride, se_ratio=se, activation=act, block_id=bid,
                skip_connection=skip, rate=rate, dtype=dt, name=f"block_{bid}",
            )(x, train=train)

        r = nn.relu
        if self.variant == "small":
            # reference MobileNetV3Small stack_fn (:469-505)
            x = block(x, 1, depth(16), 3, 2, se_ratio, r, 0, False)
            skip = x  # OS4
            x = block(x, 72.0 / 16, depth(24), 3, 2, None, r, 1, False)
            x = block(x, 88.0 / 24, depth(24), 3, 1, None, r, 2, True)
            x = block(x, 4, depth(40), kernel, tab["os16_stride"], se_ratio,
                      activation, 3, False)
            x = block(x, 6, depth(40), kernel, 1, se_ratio, activation, 4,
                      True, tab["os16_rate"])
            x = block(x, 6, depth(40), kernel, 1, se_ratio, activation, 5,
                      True, tab["os16_rate"])
            x = block(x, 3, depth(48), kernel, 1, se_ratio, activation, 6,
                      False, tab["os16_rate"])
            x = block(x, 3, depth(48), kernel, 1, se_ratio, activation, 7,
                      True, tab["os16_rate"])
            x = block(x, 6, depth(96), kernel, tab["os32_stride"], se_ratio,
                      activation, 8, False, tab["os16_rate"])
            x = block(x, 6, depth(96), kernel, 1, se_ratio, activation, 9,
                      True, tab["os32_rate"])
            x = block(x, 6, depth(96), kernel, 1, se_ratio, activation, 10,
                      True, tab["os32_rate"])
        else:
            # reference MobileNetV3Large stack_fn (:556-600)
            x = block(x, 1, depth(16), 3, 1, None, r, 0, True)
            x = block(x, 4, depth(24), 3, 2, None, r, 1, False)
            x = block(x, 3, depth(24), 3, 1, None, r, 2, True)
            skip = x  # OS4
            x = block(x, 3, depth(40), kernel, 2, se_ratio, r, 3, False)
            x = block(x, 3, depth(40), kernel, 1, se_ratio, r, 4, True)
            x = block(x, 3, depth(40), kernel, 1, se_ratio, r, 5, True)
            x = block(x, 6, depth(80), 3, tab["os16_stride"], None,
                      activation, 6, False)
            x = block(x, 2.5, depth(80), 3, 1, None, activation, 7, True,
                      tab["os16_rate"])
            x = block(x, 2.3, depth(80), 3, 1, None, activation, 8, True,
                      tab["os16_rate"])
            x = block(x, 2.3, depth(80), 3, 1, None, activation, 9, True,
                      tab["os16_rate"])
            x = block(x, 6, depth(112), 3, 1, se_ratio, activation, 10, False,
                      tab["os16_rate"])
            x = block(x, 6, depth(112), 3, 1, se_ratio, activation, 11, True,
                      tab["os16_rate"])
            x = block(x, 6, depth(160), kernel, tab["os32_stride"], se_ratio,
                      activation, 12, False, tab["os16_rate"])
            x = block(x, 6, depth(160), kernel, 1, se_ratio, activation, 13,
                      True, tab["os32_rate"])
            x = block(x, 6, depth(160), kernel, 1, se_ratio, activation, 14,
                      True, tab["os32_rate"])
        return x, skip


class MobileNetV3LargeBody(_MobileNetV3Body):
    variant: str = "large"


class MobileNetV3SmallBody(_MobileNetV3Body):
    variant: str = "small"
