"""Fused inverted-residual (MBConv) kernel parity vs the lax oracle.

The kernel is an EXPERIMENT (see ops/pallas/mbconv.py STATUS — measured
slower than XLA on this rig, not wired into any model); these tests keep
its semantics pinned: expand+BN+relu6 / 3x3 (dilated) depthwise+BN+relu6
/ project+BN (+residual) in one pass, with E-space zero 'SAME' padding
at image boundaries and cross-chunk f32 accumulation."""

import numpy as np
import pytest

import jax.numpy as jnp

from deeplabv3p_tpu.ops.pallas.mbconv import (
    fused_inverted_residual,
    fused_inverted_residual_reference,
)


@pytest.mark.parametrize(
    "n,h,w,cin,cexp,cout,rate,residual",
    [
        (2, 16, 16, 24, 144, 24, 1, True),   # padded chunk + residual
        (1, 16, 16, 64, 384, 96, 1, False),  # 3 chunks, Cout != Cin
        (2, 8, 8, 32, 192, 32, 2, True),     # dilated (OS8-style)
        (1, 32, 16, 16, 96, 24, 1, False),   # multi-tile H, non-square
    ],
)
def test_mbconv_matches_oracle(n, h, w, cin, cexp, cout, rate, residual):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32)).astype(
        jnp.bfloat16
    )
    we = jnp.asarray(rng.randn(cin, cexp).astype(np.float32) * 0.2)
    wd = jnp.asarray(rng.randn(3, 3, cexp).astype(np.float32) * 0.2)
    wp = jnp.asarray(rng.randn(cexp, cout).astype(np.float32) * 0.1)
    se = jnp.asarray(rng.rand(cexp).astype(np.float32) + 0.5)
    be = jnp.asarray(rng.randn(cexp).astype(np.float32))
    sd = jnp.asarray(rng.rand(cexp).astype(np.float32) + 0.5)
    bd = jnp.asarray(rng.randn(cexp).astype(np.float32))
    sp = jnp.asarray(rng.rand(cout).astype(np.float32) + 0.5)
    bp = jnp.asarray(rng.randn(cout).astype(np.float32))

    args = (x, we, se, be, wd, sd, bd, wp, sp, bp)
    want = np.asarray(
        fused_inverted_residual_reference(
            *args, rate=rate, residual=residual
        ),
        np.float32,
    )
    got = np.asarray(
        fused_inverted_residual(
            *args, rate=rate, residual=residual, interpret=True
        ),
        np.float32,
    )
    # bf16 chunk-storage reassociation only
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)
