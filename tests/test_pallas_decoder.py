"""Fused decoder front-end Pallas kernel tests (VERDICT r1 item #5):
lax-oracle parity in interpreter mode + end-to-end model equality between
the fused and standard decoder paths from the same variables."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplabv3p_tpu.ops.pallas.decoder import (
    _resize_weights,
    fused_decoder_frontend,
    fused_decoder_reference,
)

RNG = np.random.RandomState(0)


def _rand_case(n, he, we, hs, ws, ce, cs):
    x = jnp.asarray(RNG.randn(n, he, we, ce).astype(np.float32))
    skip = jnp.asarray(np.abs(RNG.randn(n, hs, ws, cs)).astype(np.float32))
    dwk = jnp.asarray(RNG.randn(3, 3, ce + cs).astype(np.float32) * 0.2)
    scale = jnp.asarray(np.abs(RNG.randn(ce + cs)).astype(np.float32))
    bias = jnp.asarray(RNG.randn(ce + cs).astype(np.float32) * 0.1)
    return x, skip, dwk, scale, bias


def test_resize_weight_matrix_matches_jax_image():
    """The kernel's constant interpolation matrices must reproduce
    jax.image.resize 'linear' (half-pixel, edge clamp) exactly."""
    x = jnp.asarray(RNG.randn(1, 8, 8, 4).astype(np.float32))
    want = jax.image.resize(x, (1, 32, 32, 4), method="linear")
    wr = jnp.asarray(_resize_weights(32, 8))
    got = jnp.einsum("Hh,nhwc->nHwc", wr, x)
    got = jnp.einsum("Ww,nHwc->nHWc", wr, got)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("case", [
    # (he, we, hs, ws, ce, cs): OS16→OS4 (4x), OS8→OS4 (2x), tiny 1-tile
    (8, 8, 32, 32, 256, 48),
    (16, 16, 32, 32, 128, 48),
    (8, 8, 8, 8, 128, 24),
    # non-square (cityscapes-style)
    (4, 8, 16, 32, 128, 48),
])
def test_fused_decoder_matches_oracle(case):
    he, we, hs, ws, ce, cs = case
    x, skip, dwk, scale, bias = _rand_case(2, he, we, hs, ws, ce, cs)
    got = fused_decoder_frontend(
        x, skip, dwk, scale, bias, tile=16, interpret=True
    )
    want = fused_decoder_reference(x, skip, dwk, scale, bias)
    assert got.shape == (2, hs, ws, ce + cs)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


def test_fused_decoder_row_tiling_invariance():
    """Same result whatever the row-tile size (halo handling)."""
    x, skip, dwk, scale, bias = _rand_case(1, 8, 8, 32, 32, 128, 48)
    outs = [
        np.asarray(fused_decoder_frontend(
            x, skip, dwk, scale, bias, tile=t, interpret=True
        ))
        for t in (8, 16, 32)
    ]
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-5)
    np.testing.assert_allclose(outs[0], outs[2], atol=1e-5)


def test_model_fused_decoder_equals_standard():
    """Full-model equality: fused_decoder=True must reproduce the
    standard path from the SAME variables (checkpoint compatibility)."""
    from deeplabv3p_tpu.models.factory import build_deeplab_model

    x = jnp.asarray(RNG.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1)
    std = build_deeplab_model("mobilenetv2", 5, output_stride=16)
    fused = build_deeplab_model(
        "mobilenetv2", 5, output_stride=16, fused_decoder=True
    )
    variables = jax.jit(std.init)(jax.random.PRNGKey(0), x)

    out_std = np.asarray(
        jax.jit(lambda v, b: std.apply(v, b, train=False))(variables, x)
    )
    out_fused = np.asarray(
        jax.jit(lambda v, b: fused.apply(v, b, train=False))(variables, x)
    )
    assert out_std.shape == out_fused.shape
    np.testing.assert_allclose(out_fused, out_std, atol=2e-4, rtol=1e-4)

    # training path ignores the flag (standard graph, BN updates intact)
    tr_std, _ = std.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    tr_fused, _ = fused.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    np.testing.assert_allclose(
        np.asarray(tr_fused), np.asarray(tr_std), atol=1e-5
    )
