"""PeleeNet backbone (two-way dense blocks, stem block).

TPU-native rebuild of the reference feature extractor
(/root/reference/deeplabv3p/models/deeplabv3p_peleenet.py:63-253):
stem block (conv + parallel maxpool/conv-downsample + 1x1 fuse, :97-113),
4 dense stages ([3, 4, 8, 6] two-branch dense layers, growth 32,
bottleneck widths [1, 2, 4, 4], :229-243), 1x1 transitions, and
OS-controlled AveragePooling2D downsampling between stages (:246-253) —
PeleeNet controls output stride by *where pooling stops*, not dilation.
Skip feature = transition1 output at OS4 (:243-245).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from deeplabv3p_tpu.models.layers import BatchNorm, _conv


class BasicConv(nn.Module):
    """conv + BN (+ReLU) (reference basic_conv2d_graph, :118-126)."""

    out_channels: int
    kernel_size: int = 3
    strides: int = 1
    activation: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = _conv(
            self.out_channels, self.kernel_size, strides=self.strides,
            name="conv", dtype=self.dtype,
        )(x)
        x = BatchNorm(dtype=self.dtype, name="norm")(x, train=train)
        if self.activation:
            x = nn.relu(x)
        return x


class DenseLayer(nn.Module):
    """Two-branch dense layer (reference dense_graph, :63-87):
    branch1 = 1x1→3x3 (half growth), branch2 = 1x1→3x3→3x3; concat."""

    growth_rate: int
    bottleneck_width: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        growth = self.growth_rate // 2
        inter = int(growth * self.bottleneck_width / 4) * 4
        num_in = x.shape[-1]
        if inter > num_in / 2:
            inter = int(num_in / 8) * 4  # reference :69-71 adjust
        dt = self.dtype

        b1 = BasicConv(inter, 1, dtype=dt, name="branch1a")(x, train=train)
        b1 = BasicConv(growth, 3, dtype=dt, name="branch1b")(b1, train=train)

        b2 = BasicConv(inter, 1, dtype=dt, name="branch2a")(x, train=train)
        b2 = BasicConv(growth, 3, dtype=dt, name="branch2b")(b2, train=train)
        b2 = BasicConv(growth, 3, dtype=dt, name="branch2c")(b2, train=train)
        return jnp.concatenate([x, b1, b2], axis=-1)


class StemBlock(nn.Module):
    """Stem: 3x3/2 → {maxpool/2 ∥ 1x1→3x3/2} → concat → 1x1
    (reference stem_block_graph, :97-113)."""

    num_init_features: int = 32
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        half = self.num_init_features // 2
        dt = self.dtype
        out = BasicConv(self.num_init_features, 3, strides=2, dtype=dt,
                        name="stem1")(x, train=train)
        b2 = BasicConv(half, 1, dtype=dt, name="stem2a")(out, train=train)
        b2 = BasicConv(self.num_init_features, 3, strides=2, dtype=dt,
                       name="stem2b")(b2, train=train)
        b1 = nn.max_pool(out, (2, 2), strides=(2, 2))
        out = jnp.concatenate([b1, b2], axis=-1)
        return BasicConv(self.num_init_features, 1, dtype=dt, name="stem3")(
            out, train=train
        )


class PeleeNetBody(nn.Module):
    """Returns (features@OS, skip@OS4)."""

    output_stride: int = 16
    growth_rate: int = 32
    block_config: Sequence[int] = (3, 4, 8, 6)
    num_init_features: int = 32
    bottleneck_width: Sequence[int] = (1, 2, 4, 4)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        if self.output_stride not in (8, 16, 32):
            raise ValueError(f"invalid output stride {self.output_stride}")
        dt = self.dtype
        x = StemBlock(self.num_init_features, dtype=dt,
                      name="bbn_features_stemblock")(x, train=train)
        num_features = self.num_init_features
        skip = None
        n_blocks = len(self.block_config)
        for i, num_layers in enumerate(self.block_config):
            for j in range(num_layers):
                x = DenseLayer(
                    self.growth_rate, self.bottleneck_width[i], dtype=dt,
                    name=f"bbn_features_denseblock{i + 1}_denselayer{j + 1}",
                )(x, train=train)
            num_features += num_layers * self.growth_rate
            x = BasicConv(num_features, 1, dtype=dt,
                          name=f"bbn_features_transition{i + 1}")(x, train=train)
            if i == 0:
                skip = x  # OS4 (reference :243-245)
            # OS-controlled pooling (reference :247-253)
            if (
                (self.output_stride == 8 and i < 1)
                or (self.output_stride == 16 and i < 2)
                or (self.output_stride == 32 and i != n_blocks - 1)
            ):
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x, skip
