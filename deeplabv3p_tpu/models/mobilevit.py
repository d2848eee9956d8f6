"""MobileViT S/XS/XXS backbones — the reference's only attention model.

TPU-native rebuild of /root/reference/deeplabv3p/models/deeplabv3p_mobilevit.py:
stem conv + MV2 inverted-residual blocks (swish, BN momentum 0.1,
:99-139), three MobileViT blocks (local convs → transformer over tokens →
fold → 1x1 → concat → fuse conv, :219-278) with [2, 4, 3] transformer
layers, num_heads=1 (:416), projection dims per size config (:504-547),
and the OS stride/dilation table (:356-371). Skip = OS4 after mv2 block 3
(:433-435).

Faithful quirk: the reference's `unfolding` (:193-216) is a plain Reshape
(patch_size, num_patches, C) — NOT a spatial 2x2 patch gather — and Keras
MultiHeadAttention with default attention_axes then attends over BOTH
axes jointly, i.e. full global attention over all H*W tokens. We
therefore flatten to (B, H*W, C) tokens directly: mathematically
identical, one reshape cheaper, MXU-friendly.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from deeplabv3p_tpu.models.layers import BatchNorm, DepthwiseConv, _conv

_BN_MOMENTUM = 0.1  # reference BN momentum for all MobileViT BNs (:106 etc.)


def swish(x):
    return x * jax.nn.sigmoid(x)


class ConvBlock(nn.Module):
    """conv + BN(momentum .1) + swish (reference conv_block, :75-94);
    1x1 convs ignore the dilation rate (:79-80)."""

    filters: int = 16
    kernel_size: int = 3
    strides: int = 2
    rate: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        rate = 1 if self.kernel_size == 1 else self.rate
        x = _conv(
            self.filters, self.kernel_size, strides=self.strides, rate=rate,
            name="c", dtype=self.dtype,
        )(x)
        x = BatchNorm(momentum=_BN_MOMENTUM, dtype=self.dtype, name="BN")(
            x, train=train
        )
        return swish(x)


class MV2Block(nn.Module):
    """MobileViT's inverted residual (reference inverted_residual_block,
    :99-139): expand → depthwise → project, swish, BN momentum 0.1."""

    expanded_channels: int
    output_channels: int
    strides: int
    block_id: int
    rate: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        inputs = x
        prefix = f"mv2_block_{self.block_id}_"
        dt = self.dtype
        x = _conv(self.expanded_channels, 1, name=prefix + "_expand", dtype=dt)(x)
        x = BatchNorm(momentum=_BN_MOMENTUM, dtype=dt, name=prefix + "expand_BN")(
            x, train=train
        )
        x = swish(x)
        x = DepthwiseConv(
            kernel_size=3, strides=self.strides, rate=self.rate, dtype=dt,
            name=prefix + "depthwise",
        )(x)
        x = BatchNorm(
            momentum=_BN_MOMENTUM, dtype=dt, name=prefix + "depthwise_BN"
        )(x, train=train)
        x = swish(x)
        x = _conv(self.output_channels, 1, name=prefix + "project", dtype=dt)(x)
        x = BatchNorm(
            momentum=_BN_MOMENTUM, dtype=dt, name=prefix + "project_BN"
        )(x, train=train)
        if inputs.shape[-1] == self.output_channels and self.strides == 1:
            x = x + inputs
        return x


class MultiHeadAttention(nn.Module):
    """Keras-compatible MHA (num_heads, key_dim) with importable param
    layout: query/key/value kernels (C, H, Dk), output (H, Dk, C)."""

    num_heads: int
    key_dim: int
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        features = x.shape[-1]
        # child names '<attention--*>' compose with the parent transformer
        # scope into the Keras MHA weight paths
        # ('<...>_attention/query/kernel:0') for h5 import.
        dense = lambda name, feats, axis: nn.DenseGeneral(
            features=feats, axis=axis, dtype=self.dtype,
            param_dtype=jnp.float32, name="attention--" + name,
        )
        q = dense("query", (self.num_heads, self.key_dim), -1)(x)
        k = dense("key", (self.num_heads, self.key_dim), -1)(x)
        v = dense("value", (self.num_heads, self.key_dim), -1)(x)
        scale = self.key_dim ** -0.5
        logits = jnp.einsum("...qhd,...khd->...hqk", q * scale, k)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            logits.dtype
        )
        probs = nn.Dropout(rate=self.dropout, deterministic=not train)(probs)
        out = jnp.einsum("...hqk,...khd->...qhd", probs, v)
        return dense("attention_output", features, (-2, -1))(out)


class TransformerBlock(nn.Module):
    """LN → MHA → add → LN → FF(2C→C, swish) → add (reference
    transformer_block, :152-175)."""

    projection_dim: int
    num_heads: int
    dropout: float
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = x.shape[-1]
        x1 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="LN1")(x)
        attn = MultiHeadAttention(
            self.num_heads, self.projection_dim, self.dropout,
            dtype=self.dtype, name="mha",
        )(x1, train=train)
        x2 = attn + x
        x3 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="LN2")(x2)
        # feedforward (reference :145-149)
        x3 = nn.Dense(c * 2, dtype=self.dtype, param_dtype=jnp.float32,
                      name="ff_0_dense")(x3)
        x3 = swish(x3)
        x3 = nn.Dropout(rate=self.dropout, deterministic=not train)(x3)
        x3 = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                      name="ff_1_dense")(x3)
        x3 = nn.Dropout(rate=self.dropout, deterministic=not train)(x3)
        return x3 + x2


class MobileViTBlock(nn.Module):
    """Local convs → global transformer → fold/fuse (reference
    mobilevit_block, :219-278)."""

    num_blocks: int
    num_heads: int
    projection_dim: int
    dropout: float
    block_id: int
    rate: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_channels = x.shape[-1]
        dt = self.dtype
        prefix = f"mvit_block_{self.block_id}_"

        local = ConvBlock(self.projection_dim, 3, 1, rate=self.rate,
                          dtype=dt, name=prefix + "conv1")(x, train=train)
        local = ConvBlock(self.projection_dim, 1, 1, dtype=dt,
                          name=prefix + "conv2")(local, train=train)

        n, h, w, c = local.shape
        # reference unfolding+MHA == full global attention over H*W tokens
        tokens = local.reshape(n, h * w, c)
        for i in range(self.num_blocks):
            tokens = TransformerBlock(
                self.projection_dim, self.num_heads, self.dropout, dtype=dt,
                name=prefix + f"transformer_{i}",
            )(tokens, train=train)
        folded = tokens.reshape(n, h, w, c)

        folded = ConvBlock(in_channels, 1, 1, dtype=dt,
                           name=prefix + "conv3")(folded, train=train)
        fused = jnp.concatenate([x, folded], axis=-1)
        return ConvBlock(in_channels, 3, 1, rate=self.rate, dtype=dt,
                         name=prefix + "conv4")(fused, train=train)


# size configs (reference MobileViT_S/XS/XXS, :504-547)
MOBILEVIT_CONFIGS = {
    "s": dict(channels=[16, 32, 64, 64, 96, 128, 160, 640],
              dims=[144, 192, 240], expansion=4),
    "xs": dict(channels=[16, 32, 48, 48, 64, 80, 96, 384],
               dims=[96, 120, 144], expansion=4),
    "xxs": dict(channels=[16, 16, 24, 24, 48, 64, 80, 320],
                dims=[64, 80, 96], expansion=2),
}


class MobileViTBody(nn.Module):
    """Returns (features@OS with channels[7], skip@OS4 with channels[3])."""

    size: str = "s"
    output_stride: int = 16
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        from deeplabv3p_tpu.models.mobilenetv2 import os_control_table

        cfg = MOBILEVIT_CONFIGS[self.size]
        ch, dims, exp = cfg["channels"], cfg["dims"], cfg["expansion"]
        tab = os_control_table(self.output_stride)
        dt = self.dtype
        mvit_blocks = [2, 4, 3]
        num_heads = 1  # reference :416 quirk kept for checkpoint parity

        x = ConvBlock(ch[0], 3, 2, dtype=dt, name="stem_conv")(x, train=train)
        x = MV2Block(ch[0] * exp, ch[1], 1, 0, dtype=dt, name="block_0")(
            x, train=train
        )
        x = MV2Block(ch[1] * exp, ch[2], 2, 1, dtype=dt, name="block_1")(
            x, train=train
        )
        x = MV2Block(ch[2] * exp, ch[3], 1, 2, dtype=dt, name="block_2")(
            x, train=train
        )
        x = MV2Block(ch[2] * exp, ch[3], 1, 3, dtype=dt, name="block_3")(
            x, train=train
        )
        skip = x  # OS4 (reference :433-435)

        x = MV2Block(ch[3] * exp, ch[4], 2, 4, dtype=dt, name="block_4")(
            x, train=train
        )
        x = MobileViTBlock(mvit_blocks[0], num_heads, dims[0], 0.1, 0,
                           dtype=dt, name="mvit_0")(x, train=train)

        x = MV2Block(ch[5] * exp, ch[5], tab["os16_stride"], 5, dtype=dt,
                     name="block_5")(x, train=train)
        x = MobileViTBlock(mvit_blocks[1], num_heads, dims[1], 0.1, 1,
                           rate=tab["os16_rate"], dtype=dt, name="mvit_1")(
            x, train=train
        )

        x = MV2Block(ch[6] * exp, ch[6], tab["os32_stride"], 6,
                     rate=tab["os16_rate"], dtype=dt, name="block_6")(
            x, train=train
        )
        x = MobileViTBlock(mvit_blocks[2], num_heads, dims[2], 0.1, 2,
                           rate=tab["os32_rate"], dtype=dt, name="mvit_2")(
            x, train=train
        )
        x = ConvBlock(ch[7], 1, 1, rate=tab["os32_rate"], dtype=dt,
                      name="1x1_conv")(x, train=train)
        return x, skip
