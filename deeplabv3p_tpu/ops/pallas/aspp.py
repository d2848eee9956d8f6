"""Fused multi-rate atrous depthwise convolution (ASPP hot op).

The ASPP head (reference deeplabv3p/models/layers.py:114-163) runs three
3x3 depthwise convolutions over the SAME feature map at dilation rates
(r1, r2, r3) — e.g. (12, 24, 36) at OS8. Composed in XLA these are three
independent convs, each streaming the input from HBM; at OS8/512 with an
Xception trunk that is a (64, 64, 2048) bf16 tensor read three times.

This kernel computes all three rates in one pass: the grid walks channel
blocks (depthwise = channels independent), each step holds the full
spatial extent of one block in VMEM (ASPP features are at OS8/16/32, so
H, W <= 64 for 512-class inputs), reads it ONCE, and produces the three
dilated outputs via statically-unrolled shifted multiply-accumulates
(pure VPU work; 'SAME' zero padding realized by zero-padded static
shifts). Optional per-channel scale/bias + ReLU folds the inference-mode
BatchNorm of SepConv_BN's depthwise stage into the same pass.

Falls back to interpreter mode off-TPU (covered by CPU-mesh tests);
`multirate_atrous_depthwise_reference` is the lax-conv oracle.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# channels per grid step; 64 keeps the worst-case padded temp
# ((H + 2*36)^2 spatial at rate 36) plus in/out blocks inside the ~16MB
# VMEM scoped-allocation budget
_CBLOCK = 64


def _kernel(x_ref, w_ref, scale_ref, bias_ref, *out_refs,
            rates: Sequence[int], kernel_size: int, fuse_bn_relu: bool):
    x = x_ref[...]  # (H, W, CB)
    h, w = x.shape[0], x.shape[1]
    k = kernel_size
    for ri, rate in enumerate(rates):
        acc = jnp.zeros_like(x, dtype=jnp.float32)
        pad = (k // 2) * rate
        # zero-pad once per rate; taps become static slices of the padded
        # tensor — everything unrolls into fused VPU ops
        xp = jnp.pad(x, ((pad, pad), (pad, pad), (0, 0)))
        for dy in range(k):
            for dx in range(k):
                tap = jax.lax.slice(
                    xp,
                    (dy * rate, dx * rate, 0),
                    (dy * rate + h, dx * rate + w, x.shape[2]),
                )
                acc += tap.astype(jnp.float32) * w_ref[ri, dy, dx, :].astype(
                    jnp.float32
                )
        if fuse_bn_relu:
            acc = acc * scale_ref[ri, 0, :] + bias_ref[ri, 0, :]
            acc = jnp.maximum(acc, 0.0)
        out_refs[ri][...] = acc.astype(out_refs[ri].dtype)


@partial(jax.jit, static_argnames=("rates", "kernel_size", "interpret"))
def multirate_atrous_depthwise(
    x: jax.Array,  # (N, H, W, C)
    kernels: jax.Array,  # (R, k, k, C) — one depthwise kernel per rate
    rates: tuple[int, ...],
    scale: Optional[jax.Array] = None,  # (R, C) folded BN scale
    bias: Optional[jax.Array] = None,  # (R, C) folded BN bias
    kernel_size: int = 3,
    interpret: bool = False,
) -> tuple[jax.Array, ...]:
    """All-rates atrous depthwise conv in one input pass.

    Returns a tuple of R arrays shaped like x. With scale/bias given, each
    output is relu(conv * scale + bias) — the inference-mode
    depthwise+BN+ReLU stage of SepConv_BN (reference layers.py:98-104).
    """
    n, h, w, c = x.shape
    r = len(rates)
    fuse = scale is not None
    c_pad = ((c + _CBLOCK - 1) // _CBLOCK) * _CBLOCK
    if c_pad != c:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, c_pad - c)))
        kernels = jnp.pad(kernels, ((0, 0), (0, 0), (0, 0), (0, c_pad - c)))
        if fuse:
            scale = jnp.pad(scale, ((0, 0), (0, c_pad - c)))
            bias = jnp.pad(bias, ((0, 0), (0, c_pad - c)))
    if not fuse:
        scale = jnp.ones((r, c_pad), x.dtype)
        bias = jnp.zeros((r, c_pad), x.dtype)
    # (R, C) -> (R, 1, C) so SMEM/VMEM blocks stay >= 2D per rate
    scale3 = scale[:, None, :]
    bias3 = bias[:, None, :]

    grid = (n, c_pad // _CBLOCK)
    out_shape = tuple(
        jax.ShapeDtypeStruct((n, h, w, c_pad), x.dtype) for _ in range(r)
    )
    io_spec = pl.BlockSpec(
        (1, h, w, _CBLOCK), lambda i, j: (i, 0, 0, j)
    )
    outs = pl.pallas_call(
        partial(
            _squeeze_kernel, rates=tuple(rates), kernel_size=kernel_size,
            fuse_bn_relu=fuse,
        ),
        grid=grid,
        in_specs=[
            io_spec,
            pl.BlockSpec(
                (r, kernel_size, kernel_size, _CBLOCK),
                lambda i, j: (0, 0, 0, j),
            ),
            pl.BlockSpec((r, 1, _CBLOCK), lambda i, j: (0, 0, j)),
            pl.BlockSpec((r, 1, _CBLOCK), lambda i, j: (0, 0, j)),
        ],
        out_specs=tuple(io_spec for _ in range(r)),
        out_shape=out_shape,
        interpret=interpret,
    )(x, kernels, scale3, bias3)
    if c_pad != c:
        outs = tuple(o[..., :c] for o in outs)
    return outs


def _squeeze_kernel(x_ref, w_ref, scale_ref, bias_ref, *out_refs, **kw):
    """Adapter: blocks carry a leading batch dim of 1; squeeze it for the
    spatial kernel and write back."""

    class _View:
        def __init__(self, ref):
            self.ref = ref
            self.dtype = ref.dtype

        def __getitem__(self, _):
            return self.ref[0]

        def __setitem__(self, _, value):
            self.ref[0] = value

    _kernel(
        _View(x_ref), w_ref, scale_ref, bias_ref,
        *[_View(o) for o in out_refs], **kw,
    )


def multirate_atrous_depthwise_reference(
    x: jax.Array,
    kernels: jax.Array,
    rates: Sequence[int],
    scale: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
) -> tuple[jax.Array, ...]:
    """lax.conv oracle with identical semantics (per-rate depthwise SAME
    conv [+ BN scale/bias + ReLU])."""
    c = x.shape[-1]
    outs = []
    for ri, rate in enumerate(rates):
        k = kernels[ri][..., None]  # (k, k, C, 1)
        k = jnp.moveaxis(k, -2, -1).reshape(
            kernels.shape[1], kernels.shape[2], 1, c
        )
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), k.astype(jnp.float32), (1, 1), "SAME",
            rhs_dilation=(rate, rate),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
        if scale is not None:
            y = y * scale[ri] + bias[ri]
            y = jnp.maximum(y, 0.0)
        outs.append(y.astype(x.dtype))
    return tuple(outs)
