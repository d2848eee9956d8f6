"""UNet family: Standard / Lite / Simple.

TPU-native rebuild of /root/reference/unet/models/unet.py:
* UNetStandard (:14-79): classic 64→1024 conv encoder with maxpools and
  dropout 0.5 at depths 4/5, transpose-conv (2x2/2) upsampling with skip
  concats, final 2ch relu conv + num_classes 1x1;
* UNetLite (:83-148): same topology with separable convs;
* UNetSimple (:152-222): strided residual encoder (64/128/256) and
  transpose-conv + nearest-upsample residual decoder.

All emit logits at input resolution; the reference factory's
Reshape+Softmax head (/root/reference/unet/model.py:21-61) is replaced by
explicit softmax at the call site.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from deeplabv3p_tpu.models.layers import (
    BatchNorm,
    ConvTransposeK,
    DepthwiseConv,
    _conv,
)
from deeplabv3p_tpu.ops.resize import resize_nearest


class SeparableConv(nn.Module):
    """Keras SeparableConv2D: depthwise + pointwise (with bias).

    In Keras this is ONE layer holding depthwise_kernel / pointwise_kernel
    / bias in a single h5 group; the 'sep_dw' / 'sep_pw' scope markers let
    the weight importer map both sub-convs onto that one layer name
    (utils/keras_import.py; pinned vs real Keras SeparableConv2D in
    tests/test_tf_parity.py)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    rate: int = 1
    use_bias: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = DepthwiseConv(
            kernel_size=self.kernel_size, strides=self.strides,
            rate=self.rate, dtype=self.dtype, name="sep_dw",
        )(x)
        return _conv(
            self.features, 1, use_bias=self.use_bias, name="sep_pw",
            dtype=self.dtype,
        )(x)


def _up2(x: jax.Array) -> jax.Array:
    """Keras UpSampling2D(2) — nearest."""
    h, w = x.shape[1] * 2, x.shape[2] * 2
    return resize_nearest(x, (h, w), convention="cv2")


class _UNetEncDec(nn.Module):
    """Shared Standard/Lite topology; `separable` switches the conv type."""

    num_classes: int
    separable: bool = False
    dtype: Optional[Any] = None

    def _double_conv(self, x, filters, idx, train):
        for j in range(2):
            name = f"conv{idx}_{j}"
            if self.separable:
                x = SeparableConv(filters, 3, dtype=self.dtype, name=name)(x)
            else:
                x = _conv(filters, 3, use_bias=True, name=name,
                          dtype=self.dtype)(x)
            x = nn.relu(x)
        return x

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, freeze_level: int = 0
    ) -> jax.Array:
        # freeze_level accepted for API uniformity; the reference's UNet
        # factory ignores freezing too (unet/model.py:50-59, commented out)
        del freeze_level
        dt = self.dtype
        conv1 = self._double_conv(x, 64, 1, train)
        p1 = nn.max_pool(conv1, (2, 2), strides=(2, 2))
        conv2 = self._double_conv(p1, 128, 2, train)
        p2 = nn.max_pool(conv2, (2, 2), strides=(2, 2))
        conv3 = self._double_conv(p2, 256, 3, train)
        p3 = nn.max_pool(conv3, (2, 2), strides=(2, 2))
        conv4 = self._double_conv(p3, 512, 4, train)
        conv4 = nn.Dropout(0.5, deterministic=not train)(conv4)
        p4 = nn.max_pool(conv4, (2, 2), strides=(2, 2))
        conv5 = self._double_conv(p4, 1024, 5, train)
        conv5 = nn.Dropout(0.5, deterministic=not train)(conv5)

        def up(x, filters, idx):
            x = ConvTransposeK(
                filters, kernel_size=2, strides=2, dtype=dt,
                name=f"up{idx}",
            )(x)
            return nn.relu(x)

        x = jnp.concatenate([conv4, up(conv5, 512, 6)], axis=-1)
        x = self._double_conv(x, 512, 6, train)
        x = jnp.concatenate([conv3, up(x, 256, 7)], axis=-1)
        x = self._double_conv(x, 256, 7, train)
        x = jnp.concatenate([conv2, up(x, 128, 8)], axis=-1)
        x = self._double_conv(x, 128, 8, train)
        x = jnp.concatenate([conv1, up(x, 64, 9)], axis=-1)
        x = self._double_conv(x, 64, 9, train)
        # final 2-channel relu conv (reference unet.py:69) then 1x1 head
        if self.separable:
            x = SeparableConv(2, 3, dtype=dt, name="conv9_2")(x)
        else:
            x = _conv(2, 3, use_bias=True, name="conv9_2", dtype=dt)(x)
        x = nn.relu(x)
        logits = _conv(self.num_classes, 1, use_bias=True, name="head",
                       dtype=dt)(x)
        return logits.astype(jnp.float32)


class UNetStandard(_UNetEncDec):
    separable: bool = False


class UNetLite(_UNetEncDec):
    separable: bool = True


class UNetSimple(nn.Module):
    """Residual encoder/decoder UNet (reference unet.py:152-222)."""

    num_classes: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, freeze_level: int = 0
    ) -> jax.Array:
        del freeze_level  # API uniformity; no freeze semantics for UNet
        dt = self.dtype
        x = _conv(32, 3, strides=2, use_bias=True, name="entry", dtype=dt)(x)
        x = BatchNorm(dtype=dt, name="entry_BN")(x, train=train)
        x = nn.relu(x)
        prev = x

        for i, filters in enumerate([64, 128, 256]):
            x = nn.relu(x)
            x = SeparableConv(filters, 3, dtype=dt, name=f"down{i}_conv0")(x)
            x = BatchNorm(dtype=dt, name=f"down{i}_BN0")(x, train=train)
            x = nn.relu(x)
            x = SeparableConv(filters, 3, dtype=dt, name=f"down{i}_conv1")(x)
            x = BatchNorm(dtype=dt, name=f"down{i}_BN1")(x, train=train)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
            residual = _conv(filters, 1, strides=2, use_bias=True,
                             name=f"down{i}_res", dtype=dt)(prev)
            x = x + residual
            prev = x

        for i, filters in enumerate([256, 128, 64, 32]):
            x = nn.relu(x)
            x = ConvTransposeK(filters, kernel_size=3, strides=1, dtype=dt,
                               name=f"up{i}_conv0")(x)
            x = BatchNorm(dtype=dt, name=f"up{i}_BN0")(x, train=train)
            x = nn.relu(x)
            x = ConvTransposeK(filters, kernel_size=3, strides=1, dtype=dt,
                               name=f"up{i}_conv1")(x)
            x = BatchNorm(dtype=dt, name=f"up{i}_BN1")(x, train=train)
            x = _up2(x)
            residual = _conv(filters, 1, use_bias=True, name=f"up{i}_res",
                             dtype=dt)(_up2(prev))
            x = x + residual
            prev = x

        logits = _conv(self.num_classes, 3, use_bias=True, name="head",
                       dtype=dt)(x)
        return logits.astype(jnp.float32)


UNET_MODEL_REGISTRY = {
    "unet_standard": UNetStandard,
    "unet_lite": UNetLite,
    "unet_simple": UNetSimple,
}


def build_unet_model(
    model_type: str, num_classes: int, dtype: Optional[Any] = None
):
    """UNet factory (reference unet/model.py:21-61)."""
    if model_type not in UNET_MODEL_REGISTRY:
        raise ValueError(f"This model type is not supported now: {model_type}")
    return UNET_MODEL_REGISTRY[model_type](num_classes=num_classes, dtype=dtype)
