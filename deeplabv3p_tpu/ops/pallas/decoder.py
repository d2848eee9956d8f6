"""Fused DeepLabV3+ decoder front-end (VERDICT r1 item #5).

The decoder (reference Decoder_block, deeplabv3p/models/layers.py:199-219)
starts with the most HBM-hostile sequence in the network:

    x_up  = bilinear_resize(x_enc, OS4)        # writes 4-16x the data
    cat   = concat([x_up, skip48], -1)          # full re-read + re-write
    dw0   = depthwise3x3(cat); BN; ReLU         # re-reads it again

Composed in XLA that materializes the upsampled map and the concat in HBM.
This kernel produces the post-depthwise/BN/ReLU tensor directly from the
*encoder-resolution* features and the projected skip:

* grid = (batch, channel_block, row_tile). Channel blocks 0..K-1 cover the
  encoder channels (upsample + depthwise); the last block covers the
  48-channel skip projection (depthwise only) — the concat never exists.
* upsampling runs **in-kernel on the MXU** as two dots with constant
  half-pixel interpolation matrices: rows via a per-tile (T+2, he) weight
  slab (halo rows encode the depthwise zero padding as all-zero weights),
  columns via a (we, ws) matrix.
* the depthwise 3x3 + folded inference BatchNorm + ReLU runs on the VPU
  over the VMEM-resident tile, exactly like ops/pallas/aspp.py.

Falls back to interpreter mode off-TPU; `fused_decoder_reference` is the
lax oracle (resize → concat → depthwise → BN → ReLU).

Measured on TPU v5e (512-px class shapes): standalone op (batch 4, f32)
6.53 ms fused vs 6.82 ms XLA (1.04x); in the full bf16 model the end-to-end
delta is neutral to slightly negative (mobilenetv2 OS16 b1: 0.92x,
xception OS16 b1: 1.03x, b8: 0.96-1.00x) — XLA's own fusion of
resize+concat+depthwise at bf16 is already near the HBM roofline for
these sizes. The kernel therefore ships OFF by default (`fused_decoder`
flag), kept for larger-batch serving shapes and as the template for
future decoder fusions. First version was 2.8x SLOWER due to in-kernel
relayouts; the transpose-free batched-dot formulation is what you see.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_CBLOCK = 128  # channels per grid step


def _resize_weights(out_size: int, in_size: int) -> np.ndarray:
    """(out, in) half-pixel bilinear interpolation matrix with edge clamp
    (the tf.image.resize / jax.image.resize 'linear' convention)."""
    w = np.zeros((out_size, in_size), np.float32)
    scale = in_size / out_size
    for y in range(out_size):
        src = (y + 0.5) * scale - 0.5
        y0 = int(np.floor(src))
        f = src - y0
        w[y, np.clip(y0, 0, in_size - 1)] += 1.0 - f
        w[y, np.clip(y0 + 1, 0, in_size - 1)] += f
    return w


def _row_weight_tiles(hs: int, he: int, tile: int) -> np.ndarray:
    """(n_tiles, tile+2, he) row-interpolation slabs including one halo
    row above/below each tile; out-of-range halo rows are all-zero (the
    depthwise 'SAME' zero padding)."""
    full = _resize_weights(hs, he)
    n_tiles = hs // tile
    slabs = np.zeros((n_tiles, tile + 2, he), np.float32)
    for t in range(n_tiles):
        y0 = t * tile - 1
        for r in range(tile + 2):
            y = y0 + r
            if 0 <= y < hs:
                slabs[t, r] = full[y]
    return slabs


@partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_decoder_frontend(
    x_enc: jax.Array,    # (N, he, we, Ce) encoder output (post-ASPP)
    skip48: jax.Array,   # (N, hs, ws, Cs) projected skip (post BN+ReLU)
    dw_kernel: jax.Array,  # (3, 3, Ce+Cs) decoder_conv0 depthwise kernel
    scale: jax.Array,    # (Ce+Cs,) folded BN scale
    bias: jax.Array,     # (Ce+Cs,) folded BN bias
    tile: int = 32,
    interpret: bool = False,
) -> jax.Array:
    """relu(BN(depthwise3x3(concat([upsample(x_enc), skip48])))) without
    materializing the upsample or the concat. Returns (N, hs, ws, Ce+Cs).
    """
    n, he, we, ce = x_enc.shape
    _, hs, ws, cs = skip48.shape
    assert ce % _CBLOCK == 0, f"encoder channels {ce} must tile by {_CBLOCK}"
    if hs % tile != 0:
        tile = hs  # small maps: one tile
    n_tiles = hs // tile
    n_enc_blocks = ce // _CBLOCK
    c_out = ce + cs
    c_pad = (n_enc_blocks + 1) * _CBLOCK

    # skip: pad channels to one block and rows by the halo, then
    # pre-gather the overlapping row tiles into their own axis so each
    # grid step loads only its (tile+2, ws, CB) slab (a full-resident
    # skip block blows the 16M VMEM scoped limit at 128x128x128)
    skip_p = jnp.pad(
        skip48, ((0, 0), (1, 1), (0, 0), (0, _CBLOCK - cs))
    )
    skip_tiles = jnp.stack(
        [skip_p[:, t * tile:t * tile + tile + 2] for t in range(n_tiles)],
        axis=1,
    )  # (N, n_tiles, tile+2, ws, CB)
    # depthwise kernel / BN params: encoder blocks then the skip block
    dwk = jnp.pad(dw_kernel, ((0, 0), (0, 0), (0, c_pad - c_out)))
    sc = jnp.pad(scale, (0, c_pad - c_out))[None, :]
    bi = jnp.pad(bias, (0, c_pad - c_out))[None, :]

    wr = jnp.asarray(_row_weight_tiles(hs, he, tile))
    wc = jnp.asarray(_resize_weights(ws, we).T)  # (we, ws)

    grid = (n, n_enc_blocks + 1, n_tiles)
    out = pl.pallas_call(
        partial(_kernel_impl, n_enc_blocks=n_enc_blocks, tile=tile, ws=ws),
        grid=grid,
        in_specs=[
            # encoder block: resident across row tiles (index ignores t);
            # for the skip step it degenerates to block 0 (unused)
            pl.BlockSpec(
                (1, he, we, _CBLOCK),
                lambda i, j, t: (i, 0, 0, jnp.minimum(j, n_enc_blocks - 1)),
            ),
            # skip row-tile slab for this t
            pl.BlockSpec(
                (1, 1, tile + 2, ws, _CBLOCK),
                lambda i, j, t: (i, t, 0, 0, 0),
            ),
            pl.BlockSpec((1, tile + 2, he), lambda i, j, t: (t, 0, 0)),
            pl.BlockSpec((we, ws), lambda i, j, t: (0, 0)),
            pl.BlockSpec((3, 3, _CBLOCK), lambda i, j, t: (0, 0, j)),
            pl.BlockSpec((1, _CBLOCK), lambda i, j, t: (0, j)),
            pl.BlockSpec((1, _CBLOCK), lambda i, j, t: (0, j)),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, ws, _CBLOCK), lambda i, j, t: (i, t, 0, j)
        ),
        out_shape=jax.ShapeDtypeStruct((n, hs, ws, c_pad), x_enc.dtype),
        interpret=interpret,
    )(x_enc, skip_tiles, wr, wc, dwk, sc, bi)
    return out[..., :c_out]


def _kernel_impl(x_ref, skip_ref, wr_ref, wc_ref, dwk_ref, scale_ref,
                 bias_ref, out_ref, *, n_enc_blocks: int, tile: int, ws: int):
    j = pl.program_id(1)
    t = pl.program_id(2)

    def dw_bn_relu(slab):
        padded = jnp.pad(slab, ((0, 0), (1, 1), (0, 0)))
        acc = jnp.zeros((tile, ws, slab.shape[2]), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                tap = jax.lax.slice(
                    padded, (dy, dx, 0),
                    (dy + tile, dx + ws, padded.shape[2]),
                )
                acc += tap * dwk_ref[dy, dx, :].astype(jnp.float32)
        acc = acc * scale_ref[0, :].astype(jnp.float32)
        acc = acc + bias_ref[0, :].astype(jnp.float32)
        out_ref[0, :, :, :] = jnp.maximum(acc, 0.0).astype(out_ref.dtype)

    @pl.when(j < n_enc_blocks)
    def _upsample_branch():
        # NO transposes (Mosaic relayouts dominated the first version):
        # rows via a plain dot with channels flattened into lanes; cols
        # via a batched dot whose LHS is the (broadcast) interpolation
        # matrix, so the output lands directly as (tile+2, ws, CB).
        # HIGHEST precision: default MXU f32 dots round through bf16.
        x = x_ref[0].astype(jnp.float32)        # (he, we, CB)
        wr = wr_ref[0].astype(jnp.float32)       # (tile+2, he)
        wc = wc_ref[...].astype(jnp.float32)     # (we, ws)
        he, we, cb = x.shape
        rows = jax.lax.dot_general(
            wr, x.reshape(he, we * cb), (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ).reshape(tile + 2, we, cb)
        wc_b = jnp.broadcast_to(wc.T[None], (tile + 2, ws, we))
        slab = jax.lax.dot_general(
            wc_b, rows, (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )                                        # (tile+2, ws, CB)
        dw_bn_relu(slab)

    @pl.when(j == n_enc_blocks)
    def _skip_branch():
        dw_bn_relu(skip_ref[0, 0].astype(jnp.float32))


def fused_decoder_reference(
    x_enc: jax.Array,
    skip48: jax.Array,
    dw_kernel: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
) -> jax.Array:
    """lax oracle: bilinear resize → concat → depthwise 'SAME' → BN → ReLU
    (the unfused decoder front-end, reference layers.py:199-213)."""
    from deeplabv3p_tpu.ops.resize import resize_bilinear

    hs, ws = skip48.shape[1], skip48.shape[2]
    up = resize_bilinear(x_enc.astype(jnp.float32), (hs, ws))
    cat = jnp.concatenate([up, skip48.astype(jnp.float32)], axis=-1)
    c = cat.shape[-1]
    k = dw_kernel.reshape(3, 3, 1, c).astype(jnp.float32)
    y = jax.lax.conv_general_dilated(
        cat, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    y = y * scale + bias
    return jnp.maximum(y, 0.0).astype(x_enc.dtype)
