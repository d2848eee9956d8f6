"""Fast-SCNN: real-time segmentation network.

TPU-native rebuild of /root/reference/fast_scnn/models/fast_scnn.py:
learning-to-downsample (conv + 2 separable convs, :102-104), global
feature extractor (3 bottleneck stages t=6, :109-112), pyramid pooling
with bins [2, 4, 6, 8] (:67-83, including the reference's stride-2 3x3
conv inside each bin branch), feature fusion (1x1 low branch + 4x
upsampled dilated separable high branch, :115-128), and the classifier
(2 separable convs + 1x1 + dropout 0.3 + 8x nearest upsample, :131-149).

Emits logits at input resolution (the reference's in-graph
Reshape+Softmax, :144-147, is an explicit call-site op here).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from deeplabv3p_tpu.models.layers import BatchNorm, _conv
from deeplabv3p_tpu.models.unet import SeparableConv
from deeplabv3p_tpu.ops.resize import resize_bilinear, resize_nearest


class ConvBlock(nn.Module):
    """conv or separable-conv + BN (+relu) (reference conv_block, :18-33)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    separable: bool = False
    relu: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.separable:
            x = SeparableConv(self.features, self.kernel_size,
                              strides=self.strides, dtype=self.dtype,
                              name="sep")(x)
        else:
            x = _conv(self.features, self.kernel_size, strides=self.strides,
                      use_bias=True, name="conv", dtype=self.dtype)(x)
        x = BatchNorm(dtype=self.dtype, name="BN")(x, train=train)
        if self.relu:
            x = nn.relu(x)
        return x


class ResBottleneck(nn.Module):
    """MobileNet-style bottleneck (reference _res_bottleneck, :36-53)."""

    filters: int
    kernel: int
    t: int
    strides: int
    residual: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        inputs = x
        tchannel = x.shape[-1] * self.t
        dt = self.dtype
        x = ConvBlock(tchannel, 1, 1, dtype=dt, name="expand")(x, train=train)
        from deeplabv3p_tpu.models.layers import DepthwiseConv

        x = DepthwiseConv(kernel_size=self.kernel, strides=self.strides,
                          use_bias=True, dtype=dt, name="depthwise")(x)
        x = BatchNorm(dtype=dt, name="dw_BN")(x, train=train)
        x = nn.relu(x)
        x = ConvBlock(self.filters, 1, 1, relu=False, dtype=dt,
                      name="project")(x, train=train)
        if self.residual:
            x = x + inputs
        return x


class PyramidPooling(nn.Module):
    """PPM with bins [2,4,6,8] (reference pyramid_pooling_block, :67-83):
    per-bin avg pool → 3x3/2 conv → bilinear resize back, concat."""

    bin_sizes: Sequence[int] = (2, 4, 6, 8)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h, w = x.shape[1], x.shape[2]
        outs = [x]
        for bin_size in self.bin_sizes:
            # clamp for feature maps smaller than the bin count (the
            # reference assumes Cityscapes-sized inputs and would crash)
            ph, pw = max(1, h // bin_size), max(1, w // bin_size)
            p = nn.avg_pool(x, (ph, pw), strides=(ph, pw))
            p = _conv(128, 3, strides=2, use_bias=True,
                      name=f"bin{bin_size}_conv", dtype=self.dtype)(p)
            p = resize_bilinear(p.astype(jnp.float32), (h, w)).astype(x.dtype)
            outs.append(p)
        return jnp.concatenate(outs, axis=-1)


class FastSCNN(nn.Module):
    """Returns logits (N, H, W, num_classes) at input resolution."""

    num_classes: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, freeze_level: int = 0
    ) -> jax.Array:
        del freeze_level  # API uniformity (no transfer-freeze for Fast-SCNN)
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)

        # Step 1: learning to downsample (reference :102-104)
        lds = ConvBlock(32, 3, 2, dtype=dt, name="lds_conv")(x, train=train)
        lds = ConvBlock(48, 3, 2, separable=True, dtype=dt, name="lds_ds1")(
            lds, train=train
        )
        lds = ConvBlock(64, 3, 2, separable=True, dtype=dt, name="lds_ds2")(
            lds, train=train
        )

        # Step 2: global feature extractor (reference :109-112)
        def stage(x, filters, strides, n, sid):
            x = ResBottleneck(filters, 3, 6, strides, dtype=dt,
                              name=f"gfe{sid}_0")(x, train=train)
            for i in range(1, n):
                x = ResBottleneck(filters, 3, 6, 1, residual=True, dtype=dt,
                                  name=f"gfe{sid}_{i}")(x, train=train)
            return x

        gfe = stage(lds, 64, 2, 3, 0)
        gfe = stage(gfe, 96, 2, 3, 1)
        gfe = stage(gfe, 128, 1, 3, 2)
        gfe = PyramidPooling(dtype=dt, name="ppm")(gfe, train=train)

        # Step 3: feature fusion (reference :115-128)
        ff1 = ConvBlock(128, 1, 1, relu=False, dtype=dt, name="ff_low")(
            lds, train=train
        )
        h, w = gfe.shape[1] * 4, gfe.shape[2] * 4
        ff2 = resize_nearest(gfe, (h, w), convention="cv2")
        ff2 = SeparableConv(128, 3, rate=4, dtype=dt, name="ff_dsconv")(ff2)
        ff2 = BatchNorm(dtype=dt, name="ff_dsconv_BN")(ff2, train=train)
        ff2 = nn.relu(ff2)
        ff2 = _conv(128, 1, use_bias=True, name="ff_conv", dtype=dt)(ff2)
        ff = ff1 + ff2
        ff = BatchNorm(dtype=dt, name="ff_BN")(ff, train=train)
        ff = nn.relu(ff)

        # Step 4: classifier (reference :131-149)
        c = ConvBlock(128, 3, 1, separable=True, dtype=dt,
                      name="DSConv1_classifier")(ff, train=train)
        c = ConvBlock(128, 3, 1, separable=True, dtype=dt,
                      name="DSConv2_classifier")(c, train=train)
        c = ConvBlock(self.num_classes, 1, 1, relu=False, dtype=dt,
                      name="classifier_conv")(c, train=train)
        c = nn.Dropout(0.3, deterministic=not train)(c)
        out_h, out_w = c.shape[1] * 8, c.shape[2] * 8
        logits = resize_nearest(c, (out_h, out_w), convention="cv2")
        return logits.astype(jnp.float32)


FAST_SCNN_MODEL_REGISTRY = {"fast_scnn": FastSCNN}


def build_fast_scnn_model(
    model_type: str, num_classes: int, dtype: Optional[Any] = None
):
    """Fast-SCNN factory (reference fast_scnn/model.py:19-45)."""
    if model_type not in FAST_SCNN_MODEL_REGISTRY:
        raise ValueError(f"This model type is not supported now: {model_type}")
    return FAST_SCNN_MODEL_REGISTRY[model_type](
        num_classes=num_classes, dtype=dtype
    )
