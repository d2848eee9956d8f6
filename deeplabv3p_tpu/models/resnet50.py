"""ResNet50 backbone with dilated stages 4/5.

TPU-native rebuild of the reference feature extractor
(/root/reference/deeplabv3p/models/deeplabv3p_resnet50.py:145-283):
conv1 (explicit 3-pad, 7x7/2, VALID) → maxpool (1-pad, 3x3/2) → stages
2..5 of bottleneck blocks, with the OS→(stride, dilation) table at
:201-215 and the OS4 skip after stage 2 (:273-274).

Keras layer naming ('res2a_branch2a' / 'bn2a_branch2a') is preserved via
module names so ImageNet h5 checkpoints import by name.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from deeplabv3p_tpu.models.layers import BatchNorm, _conv


class BottleneckBlock(nn.Module):
    """ResNet bottleneck: 1x1 → kxk → 1x1 (+ conv shortcut when
    `conv_shortcut`). Reference identity_block (:32-77) / conv_block
    (:80-143)."""

    kernel_size: int
    filters: Sequence[int]
    stage: int
    block: str
    strides: int = 1
    rate: int = 1
    conv_shortcut: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        f1, f2, f3 = self.filters
        conv_base = f"res{self.stage}{self.block}_branch"
        bn_base = f"bn{self.stage}{self.block}_branch"
        dt = self.dtype
        inputs = x

        x = _conv(
            f1, 1, strides=self.strides, rate=self.rate, use_bias=True,
            name=conv_base + "2a", dtype=dt,
        )(x)
        x = BatchNorm(dtype=dt, name=bn_base + "2a")(x, train=train)
        x = nn.relu(x)

        x = _conv(
            f2, self.kernel_size, rate=self.rate, use_bias=True,
            name=conv_base + "2b", dtype=dt,
        )(x)
        x = BatchNorm(dtype=dt, name=bn_base + "2b")(x, train=train)
        x = nn.relu(x)

        x = _conv(f3, 1, rate=self.rate, use_bias=True,
                  name=conv_base + "2c", dtype=dt)(x)
        x = BatchNorm(dtype=dt, name=bn_base + "2c")(x, train=train)

        if self.conv_shortcut:
            shortcut = _conv(
                f3, 1, strides=self.strides, rate=self.rate, use_bias=True,
                name=conv_base + "1", dtype=dt,
            )(inputs)
            shortcut = BatchNorm(dtype=dt, name=bn_base + "1")(
                shortcut, train=train
            )
        else:
            shortcut = inputs
        return nn.relu(x + shortcut)


class ResNet50Body(nn.Module):
    """Returns (features@OS, skip@OS4 with 256ch)."""

    output_stride: int = 16
    dtype: Optional[Any] = None
    # checkpoint each BottleneckBlock (factory remat='block'): bwd
    # replays one block at a time — trades idle-MXU FLOPs for saved-
    # activation HBM traffic on this HBM-bound train step
    remat_blocks: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        # OS control table (reference :201-215)
        if self.output_stride == 8:
            s16, r16, s32, r32 = 1, 2, 1, 4
        elif self.output_stride == 16:
            s16, r16, s32, r32 = 2, 1, 1, 2
        elif self.output_stride == 32:
            s16, r16, s32, r32 = 2, 1, 2, 1
        else:
            raise ValueError(f"invalid output stride {self.output_stride}")
        dt = self.dtype

        # conv1: explicit (3,3) pad + 7x7/2 VALID (reference :251-257)
        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        x = _conv(64, 7, strides=2, padding="VALID", use_bias=True,
                  name="conv1", dtype=dt)(x)
        x = BatchNorm(dtype=dt, name="bn_conv1")(x, train=train)
        x = nn.relu(x)
        # pool1: explicit (1,1) pad + 3x3/2 max VALID (reference :258-259)
        x = jnp.pad(
            x, ((0, 0), (1, 1), (1, 1), (0, 0)),
            constant_values=-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else 0,
        )
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        block_cls = BottleneckBlock
        if self.remat_blocks:
            # static_argnums: (module, x, train) — train is compile-time
            block_cls = nn.remat(BottleneckBlock, static_argnums=(2,))

        def blocks(x, filters, stage, names, strides=1, rate=1):
            for i, b in enumerate(names):
                x = block_cls(
                    3, filters, stage, b,
                    strides=strides if i == 0 else 1, rate=rate,
                    conv_shortcut=(i == 0), dtype=dt,
                    name=f"stage{stage}{b}",
                )(x, train)
            return x

        x = blocks(x, [64, 64, 256], 2, ["a", "b", "c"], strides=1)
        skip = x  # OS4 (reference :273-274)
        x = blocks(x, [128, 128, 512], 3, ["a", "b", "c", "d"], strides=2)
        # native OS16 stage, dilated per table (reference :277-282)
        x = blocks(x, [256, 256, 1024], 4, ["a", "b", "c", "d", "e", "f"],
                   strides=s16, rate=r16)
        # native OS32 stage (reference :285-287); stage-5 'a' keeps r16
        x = block_cls(
            3, [512, 512, 2048], 5, "a", strides=s32, rate=r16,
            conv_shortcut=True, dtype=dt, name="stage5a",
        )(x, train)
        for b in ["b", "c"]:
            x = block_cls(
                3, [512, 512, 2048], 5, b, rate=r32, dtype=dt,
                name=f"stage5{b}",
            )(x, train)
        return x, skip
