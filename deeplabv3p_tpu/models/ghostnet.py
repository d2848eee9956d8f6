"""GhostNet backbone (ghost modules: primary conv + cheap depthwise ops).

TPU-native rebuild of the reference feature extractor
(/root/reference/deeplabv3p/models/deeplabv3p_ghostnet.py):
stem 16ch 3x3/2 (:388-396), ghost bottlenecks (:157-201) built from
GhostModules (:135-153) with optional SE (:104-120), driven by the three
hardcoded OS32/OS16/OS8 config tables (:204-285) where s=-1 means
"stride 1 but keep the downsample structure" (`keep`), and dilation rates
replace strides past the target OS. Skip = blocks_2_0 output at OS4
(:414-416).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from deeplabv3p_tpu.models.layers import BatchNorm, DepthwiseConv, _conv
from deeplabv3p_tpu.models.mobilenetv2 import make_divisible
from deeplabv3p_tpu.ops.activations import hard_sigmoid

# (kernel, expansion_size, out_ch, se_ratio, stride, rate) per block;
# reference OS32_CFGS/OS16_CFGS/OS8_CFGS (:204-285). stride -1 == keep.
_BASE = [
    [(3, 16, 16, 0.0, 1, 1)],
    [(3, 48, 24, 0.0, 2, 1)],
    [(3, 72, 24, 0.0, 1, 1)],
    [(5, 72, 40, 0.25, 2, 1)],
    [(5, 120, 40, 0.25, 1, 1)],
]
_STAGE4_HEAD = lambda s, r: [(3, 240, 80, 0.0, s, 1)]
_STAGE4_TAIL = lambda r: [
    (3, 200, 80, 0.0, 1, r), (3, 184, 80, 0.0, 1, r), (3, 184, 80, 0.0, 1, r),
    (3, 480, 112, 0.25, 1, r), (3, 672, 112, 0.25, 1, r),
]
_STAGE5_HEAD = lambda s, r: [(5, 672, 160, 0.25, s, r)]
_STAGE5_TAIL = lambda r: [
    (5, 960, 160, 0.0, 1, r), (5, 960, 160, 0.25, 1, r),
    (5, 960, 160, 0.0, 1, r), (5, 960, 160, 0.25, 1, r),
]


def ghostnet_cfgs(output_stride: int):
    if output_stride == 32:
        return _BASE + [
            _STAGE4_HEAD(2, 1), _STAGE4_TAIL(1),
            _STAGE5_HEAD(2, 1), _STAGE5_TAIL(1),
        ]
    if output_stride == 16:
        return _BASE + [
            _STAGE4_HEAD(2, 1), _STAGE4_TAIL(1),
            _STAGE5_HEAD(-1, 1), _STAGE5_TAIL(2),
        ]
    if output_stride == 8:
        return _BASE + [
            _STAGE4_HEAD(-1, 1), _STAGE4_TAIL(2),
            _STAGE5_HEAD(-1, 2), _STAGE5_TAIL(4),
        ]
    raise ValueError(f"invalid output stride {output_stride}")


class GhostModule(nn.Module):
    """primary 1x1 conv (half channels) + cheap 3x3 depthwise, concat
    (reference GhostModule, :135-153)."""

    output_chs: int
    ratio: int = 2
    dw_size: int = 3
    act: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        init_ch = int(math.ceil(self.output_chs / self.ratio))
        new_ch = int(init_ch * (self.ratio - 1))
        dt = self.dtype

        x1 = _conv(init_ch, 1, name="primary_conv_0", dtype=dt)(x)
        x1 = BatchNorm(dtype=dt, name="primary_conv_1")(x1, train=train)
        if self.act:
            x1 = nn.relu(x1)

        x2 = DepthwiseConv(kernel_size=self.dw_size, dtype=dt,
                           name="cheap_operation_0")(x1)
        x2 = BatchNorm(dtype=dt, name="cheap_operation_1")(x2, train=train)
        if self.act:
            x2 = nn.relu(x2)
        return jnp.concatenate([x1, x2], axis=-1)


class SqueezeExcite(nn.Module):
    """SE with ReLU reduce + hard-sigmoid gate (reference :104-120)."""

    se_ratio: float = 0.25
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        chs = x.shape[-1]
        reduce_chs = make_divisible(chs * self.se_ratio, 4)
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = _conv(reduce_chs, 1, use_bias=True, name="conv_reduce",
                  dtype=self.dtype)(s)
        s = nn.relu(s)
        s = _conv(chs, 1, use_bias=True, name="conv_expand",
                  dtype=self.dtype)(s)
        return x * hard_sigmoid(s)


class GhostBottleneck(nn.Module):
    """Ghost bottleneck w/ optional dw + SE (reference :157-201)."""

    mid_chs: int
    out_chs: int
    dw_kernel_size: int = 3
    stride: int = 1
    rate: int = 1
    keep: bool = False
    se_ratio: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        inputs = x
        dt = self.dtype
        in_chs = x.shape[-1]

        x = GhostModule(self.mid_chs, act=True, dtype=dt, name="ghost1")(
            x, train=train
        )
        if self.stride > 1 or self.keep:
            x = DepthwiseConv(
                kernel_size=self.dw_kernel_size, strides=self.stride,
                rate=self.rate, dtype=dt, name="conv_dw",
            )(x)
            x = BatchNorm(dtype=dt, name="bn_dw")(x, train=train)
        if self.se_ratio and self.se_ratio > 0:
            x = SqueezeExcite(self.se_ratio, dtype=dt, name="se")(x)
        x = GhostModule(self.out_chs, act=False, dtype=dt, name="ghost2")(
            x, train=train
        )

        if in_chs == self.out_chs and self.stride == 1:
            sc = inputs
        else:
            sc = DepthwiseConv(
                kernel_size=self.dw_kernel_size, strides=self.stride,
                rate=self.rate, dtype=dt, name="shortcut_0",
            )(inputs)
            sc = BatchNorm(dtype=dt, name="shortcut_1")(sc, train=train)
            sc = _conv(self.out_chs, 1, name="shortcut_2", dtype=dt)(sc)
            sc = BatchNorm(dtype=dt, name="shortcut_3")(sc, train=train)
        return x + sc


class GhostNetBody(nn.Module):
    """Returns (features@OS with 960ch, skip@OS4 with 24ch).

    The body ends with the reference's `blocks_9_0` ConvBnAct — a 1x1
    conv expanding the last bottleneck's 160ch to 960 (the final exp
    size) before the segmentation head (reference
    deeplabv3p_ghostnet.py:421-424, ConvBnAct :123-133). Round 3 found
    this via the direct reference-builder oracle: both our body and the
    hand-written Keras twin had omitted it (a shared misreading the
    twin-based oracle could not catch)."""

    output_stride: int = 16
    width: float = 1.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        dt = self.dtype
        out_ch = int(make_divisible(16 * self.width, 4))
        x = _conv(out_ch, 3, strides=2, name="conv_stem", dtype=dt)(x)
        x = BatchNorm(dtype=dt, name="bn1")(x, train=train)
        x = nn.relu(x)

        skip = None
        for index, cfg in enumerate(ghostnet_cfgs(self.output_stride)):
            for sub_index, (k, exp, c, se, s, r) in enumerate(cfg):
                keep = s == -1
                stride = 1 if keep else s
                x = GhostBottleneck(
                    mid_chs=int(make_divisible(exp * self.width, 4)),
                    out_chs=int(make_divisible(c * self.width, 4)),
                    dw_kernel_size=k, stride=stride, rate=r, keep=keep,
                    se_ratio=se, dtype=dt,
                    name=f"blocks_{index}_{sub_index}",
                )(x, train=train)
                if index == 2 and sub_index == 0:
                    skip = x  # OS4 (reference :414-416)

        # final 1x1 expansion to the last exp size (960*width), the
        # feature the reference hands to ASPP (reference :421-424)
        final_ch = int(make_divisible(960 * self.width, 4))
        x = _conv(final_ch, 1, name="blocks_9_0_conv", dtype=dt)(x)
        x = BatchNorm(dtype=dt, name="blocks_9_0_bn1")(x, train=train)
        x = nn.relu(x)
        return x, skip
