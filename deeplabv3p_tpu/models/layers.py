"""Shared DeepLabV3+ building blocks as Flax modules.

Re-designed TPU-first from the reference's Keras layer graph
(/root/reference/deeplabv3p/models/layers.py):

* `BatchNorm` computes statistics over the full (mesh-global) batch. Under
  `jit` with a batch-sharded mesh, XLA inserts the cross-replica reductions,
  which *is* the reference's SyncBatchNormalization (layers.py:63-70) —
  no explicit collective code needed.
* The ASPP image-pooling branch's AveragePooling2D(H,W) + bilinear resize
  back (layers.py:129-138) collapses to a global mean + broadcast, which XLA
  fuses into neighbouring ops.
* Module leaf names mirror the reference's Keras layer names
  (e.g. `aspp1_depthwise`, `concat_projection_BN`) so h5 checkpoints can be
  imported by name.

Convolutions run in a configurable compute dtype (bf16 by default on TPU)
with fp32 parameters; BN statistics accumulate in fp32.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from deeplabv3p_tpu.ops.conv import atrous_explicit_pad
from deeplabv3p_tpu.ops.resize import resize_bilinear

# Reference layers.py:12 — L2 regularization factor applied to conv
# kernels & biases via the Deeplab*Conv2D wrappers. In JAX the penalty is
# applied in the loss (see deeplabv3p_tpu/losses.py:l2_penalty).
L2_FACTOR = 2e-5

Dtype = Any


class BatchNorm(nn.Module):
    """Batch norm with Keras defaults; sync-across-replicas under GSPMD.

    Mirrors reference CustomBatchNormalization (layers.py:63-70). Keras
    defaults: momentum=0.99, epsilon=1e-3; callers override per-site
    (e.g. MobileNet bodies use momentum=0.999, heads use eps=1e-5).
    """

    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        norm = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )
        return norm(x)


def _conv(
    features: int,
    kernel_size: int,
    *,
    strides: int = 1,
    rate: int = 1,
    padding="SAME",
    use_bias: bool = False,
    groups: int = 1,
    name: str,
    dtype: Optional[Dtype] = None,
) -> nn.Conv:
    return nn.Conv(
        features=features,
        kernel_size=(kernel_size, kernel_size),
        strides=(strides, strides),
        kernel_dilation=(rate, rate),
        padding=padding,
        feature_group_count=groups,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class DepthwiseConv(nn.Module):
    """Depthwise conv matching Keras DepthwiseConv2D semantics.

    Implemented as a grouped `lax.conv_general_dilated` with
    feature_group_count == channels; the kernel layout (H, W, 1, C) maps
    from Keras (H, W, C, 1) by a transpose in the weight importer.
    """

    kernel_size: int = 3
    strides: int = 1
    rate: int = 1
    padding: Any = "SAME"
    use_bias: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        channels = x.shape[-1]
        conv = nn.Conv(
            features=channels,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            kernel_dilation=(self.rate, self.rate),
            padding=self.padding,
            feature_group_count=channels,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="dw",
        )
        return conv(x)


class ConvTransposeK(nn.Module):
    """Transpose conv matching Keras Conv2DTranspose semantics.

    flax's ConvTranspose convolves with an UNFLIPPED kernel in
    (kh, kw, in, out) layout while Keras Conv2DTranspose stores
    (kh, kw, out, in) and flips spatially; the weight importer maps
    between the two via this module's 'ct' scope marker
    (utils/keras_import.py). Parity with real Keras is pinned in
    tests/test_tf_parity.py::test_conv_transpose_matches_keras.
    """

    features: int
    kernel_size: int = 2
    strides: int = 2
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.ConvTranspose(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding="SAME",
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="ct",
        )(x)


class ConvBN(nn.Module):
    """1x1/3x3 conv + BN (+ optional activation) convenience block."""

    features: int
    kernel_size: int = 1
    strides: int = 1
    rate: int = 1
    use_bias: bool = False
    epsilon: float = 1e-3
    momentum: float = 0.99
    activation: Optional[Callable[[jax.Array], jax.Array]] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = _conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            rate=self.rate,
            use_bias=self.use_bias,
            name="conv",
            dtype=self.dtype,
        )(x)
        x = BatchNorm(
            momentum=self.momentum, epsilon=self.epsilon, dtype=self.dtype, name="BN"
        )(x, train=train)
        if self.activation is not None:
            x = self.activation(x)
        return x


class SepConvBN(nn.Module):
    """Depthwise-separable conv with BN between depthwise & pointwise.

    Port of reference SepConv_BN (layers.py:74-111) including the manual
    effective-kernel 'same' padding for strided atrous convs
    (layers.py:88-95): stride==1 uses TF-'SAME'; stride>1 pads explicitly
    by the effective kernel and convolves VALID.
    """

    filters: int
    stride: int = 1
    kernel_size: int = 3
    rate: int = 1
    depth_activation: bool = False
    epsilon: float = 1e-3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.stride == 1:
            depth_padding: Any = "SAME"
        else:
            depth_padding = atrous_explicit_pad(self.kernel_size, self.rate)

        if not self.depth_activation:
            x = nn.relu(x)
        x = DepthwiseConv(
            kernel_size=self.kernel_size,
            strides=self.stride,
            rate=self.rate,
            padding=depth_padding,
            dtype=self.dtype,
            name="depthwise",
        )(x)
        x = BatchNorm(epsilon=self.epsilon, dtype=self.dtype, name="depthwise_BN")(
            x, train=train
        )
        if self.depth_activation:
            x = nn.relu(x)
        x = _conv(self.filters, 1, name="pointwise", dtype=self.dtype)(x)
        x = BatchNorm(epsilon=self.epsilon, dtype=self.dtype, name="pointwise_BN")(
            x, train=train
        )
        if self.depth_activation:
            x = nn.relu(x)
        return x


def aspp_rates(output_stride: int) -> tuple[int, int, int]:
    """Atrous rates per output stride (reference layers.py:118-126)."""
    if output_stride == 8:
        return (12, 24, 36)
    if output_stride == 16:
        return (6, 12, 18)
    if output_stride == 32:
        return (3, 6, 9)
    raise ValueError(f"invalid output stride {output_stride}")


class ImagePoolingBranch(nn.Module):
    """ASPP image-feature branch: global mean → 1x1 conv/BN/ReLU → broadcast.

    Equivalent to reference AveragePooling2D(H,W) + bilinear resize
    (layers.py:131-138); on TPU the resize from 1x1 is a pure broadcast.
    """

    features: int = 256
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        n, h, w, _ = x.shape
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = _conv(self.features, 1, name="image_pooling", dtype=self.dtype)(pooled)
        pooled = BatchNorm(epsilon=1e-5, dtype=self.dtype, name="image_pooling_BN")(
            pooled, train=train
        )
        pooled = nn.relu(pooled)
        return jnp.broadcast_to(pooled, (n, h, w, self.features))


class ASPP(nn.Module):
    """Atrous Spatial Pyramid Pooling (reference ASPP_block, layers.py:114-163).

    Five branches — image pooling, 1x1, and three atrous separable convs at
    `aspp_rates(OS)` — concatenated and projected to 256ch, with dropout 0.5.

    Inference fast path (`fused_inference`): the three branches' depthwise
    stage runs as ONE Pallas kernel (single HBM fetch of the feature map,
    folded BN+ReLU — deeplabv3p_tpu.ops.pallas.aspp, measured 1.57x over
    three XLA convs), followed by the three pointwise+BN+ReLU stages. It
    reads the exact same parameters as the standard path, so checkpoints
    and training are unaffected.
    """

    output_stride: int = 16
    dropout_rate: float = 0.5
    fused_inference: bool = False
    dtype: Optional[Dtype] = None

    def _fused_branches(self, x: jax.Array, rates) -> list[jax.Array]:
        """Depthwise(+BN+ReLU) of aspp1..3 via the fused Pallas kernel,
        then per-branch pointwise+BN+ReLU from the same variables."""
        from deeplabv3p_tpu.ops.pallas.aspp import multirate_atrous_depthwise

        p = self.variables["params"]
        bs = self.variables["batch_stats"]
        eps = 1e-5

        kernels, scales, biases = [], [], []
        for name in ("aspp1", "aspp2", "aspp3"):
            k = p[name]["depthwise"]["dw"]["kernel"][:, :, 0, :]  # (3,3,C)
            bn_p = p[name]["depthwise_BN"]["bn"]
            bn_s = bs[name]["depthwise_BN"]["bn"]
            inv = bn_p["scale"] * jax.lax.rsqrt(bn_s["var"] + eps)
            kernels.append(k)
            scales.append(inv)
            biases.append(bn_p["bias"] - bn_s["mean"] * inv)
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        dw_outs = multirate_atrous_depthwise(
            x.astype(jnp.float32),
            jnp.stack(kernels).astype(jnp.float32),
            tuple(rates),
            scale=jnp.stack(scales),
            bias=jnp.stack(biases),
            interpret=not on_tpu,
        )

        outs = []
        for name, dw in zip(("aspp1", "aspp2", "aspp3"), dw_outs):
            pw = p[name]["pointwise"]["kernel"][0, 0]  # (Cin, 256)
            bn_p = p[name]["pointwise_BN"]["bn"]
            bn_s = bs[name]["pointwise_BN"]["bn"]
            inv = bn_p["scale"] * jax.lax.rsqrt(bn_s["var"] + eps)
            y = jnp.dot(
                dw.astype(self.dtype or jnp.float32),
                pw.astype(self.dtype or jnp.float32),
            )
            y = y * inv + (bn_p["bias"] - bn_s["mean"] * inv)
            outs.append(nn.relu(y).astype(x.dtype))
        return outs

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        rates = aspp_rates(self.output_stride)

        b4 = ImagePoolingBranch(dtype=self.dtype, name="image_pool_branch")(
            x, train=train
        )
        b0 = _conv(256, 1, name="aspp0", dtype=self.dtype)(x)
        b0 = BatchNorm(epsilon=1e-5, dtype=self.dtype, name="aspp0_BN")(b0, train=train)
        b0 = nn.relu(b0)

        use_fused = (
            self.fused_inference
            and not train
            and self.has_variable("params", "aspp1")
            and self.has_variable("batch_stats", "aspp1")
        )
        if use_fused:
            b1, b2, b3 = self._fused_branches(x, rates)
        else:
            b1 = SepConvBN(
                256, rate=rates[0], depth_activation=True, epsilon=1e-5,
                dtype=self.dtype, name="aspp1",
            )(x, train=train)
            b2 = SepConvBN(
                256, rate=rates[1], depth_activation=True, epsilon=1e-5,
                dtype=self.dtype, name="aspp2",
            )(x, train=train)
            b3 = SepConvBN(
                256, rate=rates[2], depth_activation=True, epsilon=1e-5,
                dtype=self.dtype, name="aspp3",
            )(x, train=train)

        # Branch order matches reference Concatenate([b4, b0, b1, b2, b3])
        # (layers.py:155) so the concat_projection kernel imports 1:1.
        x = jnp.concatenate([b4, b0, b1, b2, b3], axis=-1)
        x = _conv(256, 1, name="concat_projection", dtype=self.dtype)(x)
        x = BatchNorm(epsilon=1e-5, dtype=self.dtype, name="concat_projection_BN")(
            x, train=train
        )
        x = nn.relu(x)
        x = nn.Dropout(rate=self.dropout_rate, deterministic=not train)(x)
        return x


class ASPPLite(nn.Module):
    """Simplified ASPP: image pooling + 1x1 branches only
    (reference ASPP_Lite_block, layers.py:166-196)."""

    dropout_rate: float = 0.5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        b4 = ImagePoolingBranch(dtype=self.dtype, name="image_pool_branch")(
            x, train=train
        )
        b0 = _conv(256, 1, name="aspp0", dtype=self.dtype)(x)
        b0 = BatchNorm(epsilon=1e-5, dtype=self.dtype, name="aspp0_BN")(b0, train=train)
        b0 = nn.relu(b0)

        x = jnp.concatenate([b4, b0], axis=-1)
        x = _conv(256, 1, name="concat_projection", dtype=self.dtype)(x)
        x = BatchNorm(epsilon=1e-5, dtype=self.dtype, name="concat_projection_BN")(
            x, train=train
        )
        x = nn.relu(x)
        x = nn.Dropout(rate=self.dropout_rate, deterministic=not train)(x)
        return x


class Decoder(nn.Module):
    """DeepLabV3+ decoder (reference Decoder_block, layers.py:199-219):
    upsample encoder output to skip resolution, project skip to 48ch,
    concat, and refine with two separable convs.

    Inference fast path (`fused_inference`): the HBM-hostile front-end —
    bilinear upsample to skip resolution + 48ch concat + decoder_conv0's
    depthwise/BN/ReLU — runs as ONE Pallas kernel
    (deeplabv3p_tpu.ops.pallas.decoder): neither the upsampled map nor the
    concat is ever materialized in HBM, and the upsample runs on the MXU
    as two constant-matrix dots. Reads the exact same parameters as the
    standard path, so checkpoints and training are unaffected.
    """

    fused_inference: bool = False
    dtype: Optional[Dtype] = None

    def _fused_frontend(self, x: jax.Array, skip48: jax.Array) -> jax.Array:
        """upsample+concat+decoder_conv0(depthwise+BN+ReLU) via the fused
        Pallas kernel, then the pointwise+BN+ReLU stage from the same
        variables."""
        from deeplabv3p_tpu.ops.pallas.decoder import fused_decoder_frontend

        p = self.variables["params"]["decoder_conv0"]
        bs = self.variables["batch_stats"]["decoder_conv0"]
        eps = 1e-5

        dwk = p["depthwise"]["dw"]["kernel"][:, :, 0, :]  # (3, 3, C)
        inv = p["depthwise_BN"]["bn"]["scale"] * jax.lax.rsqrt(
            bs["depthwise_BN"]["bn"]["var"] + eps
        )
        dw_bias = p["depthwise_BN"]["bn"]["bias"] - (
            bs["depthwise_BN"]["bn"]["mean"] * inv
        )
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        # keep the model compute dtype (bf16) on the kernel's in/out —
        # halves its HBM traffic; the kernel accumulates in f32 internally
        y = fused_decoder_frontend(
            x,
            skip48.astype(x.dtype),
            dwk.astype(jnp.float32),
            inv.astype(jnp.float32),
            dw_bias.astype(jnp.float32),
            interpret=not on_tpu,
        )

        pw = p["pointwise"]["kernel"][0, 0]  # (C, 256)
        inv = p["pointwise_BN"]["bn"]["scale"] * jax.lax.rsqrt(
            bs["pointwise_BN"]["bn"]["var"] + eps
        )
        pw_bias = p["pointwise_BN"]["bn"]["bias"] - (
            bs["pointwise_BN"]["bn"]["mean"] * inv
        )
        dt = self.dtype or jnp.float32
        y = jnp.dot(y.astype(dt), pw.astype(dt)) * inv + pw_bias
        return nn.relu(y).astype(x.dtype)

    @nn.compact
    def __call__(
        self, x: jax.Array, skip: jax.Array, train: bool = False
    ) -> jax.Array:
        skip_hw = (skip.shape[1], skip.shape[2])

        skip = _conv(48, 1, name="feature_projection0", dtype=self.dtype)(skip)
        skip = BatchNorm(
            epsilon=1e-5, dtype=self.dtype, name="feature_projection0_BN"
        )(skip, train=train)
        skip = nn.relu(skip)

        use_fused = (
            self.fused_inference
            and not train
            and x.shape[3] % 128 == 0
            and self.has_variable("params", "decoder_conv0")
            and self.has_variable("batch_stats", "decoder_conv0")
        )
        if use_fused:
            x = self._fused_frontend(x, skip)
        else:
            x = resize_bilinear(x.astype(jnp.float32), skip_hw).astype(
                x.dtype
            )
            x = jnp.concatenate([x, skip], axis=-1)
            x = SepConvBN(
                256, depth_activation=True, epsilon=1e-5, dtype=self.dtype,
                name="decoder_conv0",
            )(x, train=train)
        x = SepConvBN(
            256, depth_activation=True, epsilon=1e-5, dtype=self.dtype,
            name="decoder_conv1",
        )(x, train=train)
        return x


def icnr_init(scale: int, base_init=None):
    """ICNR initializer for checkerboard-free sub-pixel convolution
    (reference ICNR class, layers.py:227-253; Aitken et al. 2017).

    Initializes a (kh, kw, cin, filters*scale^2) kernel by drawing a
    (kh, kw, cin, filters) sub-kernel and repeating each output channel
    scale^2 times consecutively — matching the Subpixel phase-shift
    channel decomposition (channel = c' * r^2 + ra * r + rb), so every
    r x r output block starts out identical.
    """
    if base_init is None:
        base_init = nn.initializers.lecun_normal()

    def init(key, shape, dtype=jnp.float32):
        kh, kw, cin, cout = shape
        if scale == 1:
            return base_init(key, shape, dtype)
        sub = base_init(key, (kh, kw, cin, cout // (scale**2)), dtype)
        return jnp.repeat(sub, scale**2, axis=-1)

    return init


class Subpixel(nn.Module):
    """Sub-pixel (pixel-shuffle) prediction head.

    Conv to r*r*filters then depth-to-space rearrange, equivalent to the
    reference Subpixel layer (layers.py:255-309), with optional ICNR
    initialization (layers.py:227-253).
    """

    filters: int
    kernel_size: int = 1
    r: int = 2
    use_icnr: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        r = self.r
        kernel_init = (
            icnr_init(r) if self.use_icnr else nn.initializers.lecun_normal()
        )
        x = nn.Conv(
            features=self.filters * r * r,
            kernel_size=(self.kernel_size, self.kernel_size),
            padding="SAME",
            use_bias=True,
            kernel_init=kernel_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            # 'c' is a wrapper scope the h5 importer strips: the module's
            # own name (reference auto-name 'subpixel') IS the Keras
            # layer name carrying kernel/bias
            name="c",
        )(x)
        n, h, w, c = x.shape
        cout = c // (r * r)
        # Keras phase-shift permutation (layers.py:291-302):
        # reshape (N,H,W,C/(r*r),r,r) then interleave as (N, H*r, W*r, C').
        x = x.reshape(n, h, w, cout, r, r)
        x = x.transpose(0, 1, 5, 2, 4, 3)  # N, H, r, W, r, C'
        return x.reshape(n, h * r, w * r, cout)


__all__: Sequence[str] = [
    "L2_FACTOR",
    "BatchNorm",
    "ConvBN",
    "DepthwiseConv",
    "SepConvBN",
    "ASPP",
    "ASPPLite",
    "Decoder",
    "ImagePoolingBranch",
    "Subpixel",
    "icnr_init",
    "aspp_rates",
]
