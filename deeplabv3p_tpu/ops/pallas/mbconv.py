"""Fused MobileNetV2 inverted-residual (MBConv) inference kernel.

The reference's MobileNetV2 block (deeplabv3p_mobilenetv2.py:38-74) is
expand 1x1 -> BN+relu6 -> 3x3 depthwise -> BN+relu6 -> project 1x1 -> BN
(+ residual). Composed in XLA those are three conv kernels with the
6x-EXPANDED tensor round-tripping HBM twice (written by expand, read by
depthwise; written by depthwise, read by project) — at 512x512 inference
the expanded tensors dominate the model's HBM traffic.

This kernel keeps the expanded tensor entirely in VMEM:

grid = (batch, H tiles, Cexp chunks)   [Cexp fastest]
* the input tile is passed three times with +-1-tile index maps so each
  step holds (T + 2r, W, Cin) rows — the depthwise halo — without
  overlapping BlockSpecs; boundary tiles mask the halo to zero, which IS
  TF-'SAME' padding for stride 1.
* expand: (T+2r)W x Cin  @  Cin x CB  on the MXU (f32 accumulate),
  folded BN + relu6, bf16 in VMEM.
* depthwise: 9 shifted multiply-accumulates (VPU, f32), folded BN +
  relu6 — valid vertically over the halo, zero-'SAME' horizontally.
* project: TW x CB @ CB x Cout accumulated across Cexp chunks in a VMEM
  scratch (f32); the final chunk applies the project BN fold, optional
  residual add (Cin == Cout), and writes the only HBM output.

Stride-1 blocks only (13 of MobileNetV2's 17; strided blocks change
resolution and keep the XLA path). Off TPU it runs in interpreter mode;
`fused_inverted_residual_reference` is the lax oracle.

STATUS: EXPERIMENT, NOT WIRED — measured SLOWER than XLA on this rig.
Amortized in-jit chained measurement (10 fused calls per program, TPU
v5e via the tunneled client): 4.8-6.6 ms/block vs XLA's 0.26-0.55
ms/block at the MobileNetV2 512-input block shapes. A/B variants of the
body produced non-monotonic timings (a superset body measured faster
than its subset), i.e. the tunnel's dispatch floor and caching make
kernel-level tuning unmeasurable here — and XLA's own cost analysis
shows batch-1 inference is latency-bound, not bandwidth-bound (273 MB
accessed = ~330 us of a measured 1.22 ms), capping the theoretical win
well below the risk. Kept with its oracle + interpret-mode parity tests
as the documented negative result; revisit on directly-attached TPU
hardware where per-kernel profiling works.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CBLOCK = 128  # expanded-channel chunk (one lane tile)


def _kernel(xm_ref, xc_ref, xp_ref, we_ref, se_ref, be_ref,
            wd_ref, sd_ref, bd_ref, wp_ref, sp_ref, bp_ref,
            out_ref, acc_ref, *, rate: int, n_ht: int, n_ci: int,
            residual: bool, out_dtype):
    t = pl.program_id(1)
    ci = pl.program_id(2)
    r = rate

    xm = xm_ref[0]  # (T, W, Cin) previous tile
    xc = xc_ref[0]
    xp = xp_ref[0]
    tt, w, cin = xc.shape

    top = jnp.where(t == 0, 0.0, xm[-r:].astype(jnp.float32))
    bot = jnp.where(t == n_ht - 1, 0.0, xp[:r].astype(jnp.float32))
    xh = jnp.concatenate(
        [top, xc.astype(jnp.float32), bot], axis=0
    )  # (T+2r, W, Cin)

    # expand 1x1 + folded BN + relu6 (recomputes the halo rows; identical
    # to the neighbour tile's own values)
    e = jax.lax.dot_general(
        xh.reshape(-1, cin), we_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    e = e * se_ref[0] + be_ref[0]
    e = jnp.clip(e, 0.0, 6.0)
    e = e.reshape(tt + 2 * r, w, -1).astype(jnp.bfloat16)
    # The depthwise 'SAME' zero padding lives in E-space (post-BN+relu6),
    # where a zero INPUT row maps to relu6(be) != 0 — zero the halo rows
    # themselves at the image boundary.
    row = jax.lax.broadcasted_iota(jnp.int32, (tt + 2 * r, 1, 1), 0)
    boundary = ((t == 0) & (row < r)) | (
        (t == n_ht - 1) & (row >= tt + r)
    )
    e = jnp.where(boundary, jnp.zeros_like(e), e)

    # 3x3 depthwise (dilation r): valid vertically over the halo,
    # zero-'SAME' horizontally
    acc = jnp.zeros((tt, w, e.shape[2]), jnp.float32)
    for dy in range(3):
        rows = e[dy * r : dy * r + tt]
        for dx in range(3):
            ox = dx * r - r
            x0, x1 = max(0, ox), w + min(0, ox)
            if x1 <= x0:
                continue
            src = jax.lax.slice(rows, (0, x0, 0), (tt, x1, rows.shape[2]))
            dx0 = max(0, -ox)
            tap = jnp.pad(src, ((0, 0), (dx0, w - dx0 - (x1 - x0)), (0, 0)))
            acc += tap.astype(jnp.float32) * wd_ref[dy, dx, :].astype(
                jnp.float32
            )
    d = acc * sd_ref[0] + bd_ref[0]
    d = jnp.clip(d, 0.0, 6.0).astype(jnp.bfloat16)

    # project 1x1, accumulated over Cexp chunks
    part = jax.lax.dot_general(
        d.reshape(-1, d.shape[2]), wp_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ci == 0)
    def _():
        acc_ref[...] = part

    @pl.when(ci > 0)
    def _():
        acc_ref[...] += part

    @pl.when(ci == n_ci - 1)
    def _():
        y = acc_ref[...] * sp_ref[0] + bp_ref[0]
        y = y.reshape(tt, w, -1)
        if residual:
            y = y + xc.astype(jnp.float32)
        out_ref[0] = y.astype(out_dtype)


@partial(jax.jit, static_argnames=("rate", "residual", "interpret"))
def fused_inverted_residual(
    x: jax.Array,            # (N, H, W, Cin)
    we: jax.Array,           # (Cin, Cexp) expand kernel (1x1)
    se: jax.Array, be: jax.Array,   # (Cexp,) folded expand BN
    wd: jax.Array,           # (3, 3, Cexp) depthwise kernel
    sd: jax.Array, bd: jax.Array,   # (Cexp,) folded depthwise BN
    wp: jax.Array,           # (Cexp, Cout) project kernel (1x1)
    sp: jax.Array, bp: jax.Array,   # (Cout,) folded project BN
    *,
    rate: int = 1,
    residual: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """One HBM pass over a stride-1 MobileNetV2 inverted residual."""
    n, h, w, cin = x.shape
    cexp = we.shape[1]
    cout = wp.shape[1]
    if residual and cin != cout:
        raise ValueError("residual requires Cin == Cout")

    c_pad = ((cexp + _CBLOCK - 1) // _CBLOCK) * _CBLOCK
    if c_pad != cexp:
        we = jnp.pad(we, ((0, 0), (0, c_pad - cexp)))
        wd = jnp.pad(wd, ((0, 0), (0, 0), (0, c_pad - cexp)))
        wp = jnp.pad(wp, ((0, c_pad - cexp), (0, 0)))
        se = jnp.pad(se, (0, c_pad - cexp))
        be = jnp.pad(be, (0, c_pad - cexp))
        sd = jnp.pad(sd, (0, c_pad - cexp))
        bd = jnp.pad(bd, (0, c_pad - cexp))
    n_ci = c_pad // _CBLOCK

    # H tile: largest divisor of H keeping the expanded chunk + f32
    # accumulators within a ~8 MB VMEM budget
    t_rows = h
    while t_rows > 8 and t_rows * w * _CBLOCK * 6 + t_rows * w * cout * 4 > 8_000_000:
        t_rows //= 2
    while h % t_rows:
        t_rows //= 2
    n_ht = h // t_rows

    se2 = se[None, :]
    be2 = be[None, :]
    sd2 = sd[None, :]
    bd2 = bd[None, :]
    sp2 = sp[None, :]
    bp2 = bp[None, :]

    grid = (n, n_ht, n_ci)
    xspec = lambda dt: pl.BlockSpec(
        (1, t_rows, w, cin), lambda i, t, ci, dt=dt: (i, jnp.maximum(0, jnp.minimum(t + dt, n_ht - 1)), 0, 0)
    )
    out = pl.pallas_call(
        partial(
            _kernel, rate=rate, n_ht=n_ht, n_ci=n_ci, residual=residual,
            out_dtype=x.dtype,
        ),
        grid=grid,
        in_specs=[
            xspec(-1), xspec(0), xspec(+1),
            pl.BlockSpec((cin, _CBLOCK), lambda i, t, ci: (0, ci)),
            pl.BlockSpec((1, _CBLOCK), lambda i, t, ci: (0, ci)),
            pl.BlockSpec((1, _CBLOCK), lambda i, t, ci: (0, ci)),
            pl.BlockSpec((3, 3, _CBLOCK), lambda i, t, ci: (0, 0, ci)),
            pl.BlockSpec((1, _CBLOCK), lambda i, t, ci: (0, ci)),
            pl.BlockSpec((1, _CBLOCK), lambda i, t, ci: (0, ci)),
            pl.BlockSpec((_CBLOCK, cout), lambda i, t, ci: (ci, 0)),
            pl.BlockSpec((1, cout), lambda i, t, ci: (0, 0)),
            pl.BlockSpec((1, cout), lambda i, t, ci: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, t_rows, w, cout), lambda i, t, ci: (i, t, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((t_rows * w, cout), jnp.float32)],
        interpret=interpret,
    )(x, x, x, we, se2, be2, wd, sd2, bd2, wp, sp2, bp2)
    return out


def fused_inverted_residual_reference(
    x, we, se, be, wd, sd, bd, wp, sp, bp, *, rate=1, residual=False
):
    """lax oracle with identical semantics (bf16 tensors, f32 folds)."""
    cexp = we.shape[1]
    e = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), we[None, None].astype(jnp.float32),
        (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    e = jnp.clip(e * se + be, 0.0, 6.0).astype(jnp.bfloat16)
    k = jnp.moveaxis(wd[..., None], -2, -1).reshape(3, 3, 1, cexp)
    d = jax.lax.conv_general_dilated(
        e.astype(jnp.float32), k.astype(jnp.float32), (1, 1), "SAME",
        rhs_dilation=(rate, rate), feature_group_count=cexp,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    d = jnp.clip(d * sd + bd, 0.0, 6.0).astype(jnp.bfloat16)
    p = jax.lax.conv_general_dilated(
        d.astype(jnp.float32), wp[None, None].astype(jnp.float32),
        (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = p * sp + bp
    if residual:
        y = y + x.astype(jnp.float32)
    return y.astype(x.dtype)
