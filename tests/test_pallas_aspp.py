"""Fused multi-rate atrous depthwise kernel tests (interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from deeplabv3p_tpu.ops.pallas.aspp import (
    multirate_atrous_depthwise,
    multirate_atrous_depthwise_reference,
)

RNG = np.random.RandomState(0)


def _data(n=1, h=16, w=16, c=40, r=3, k=3):
    x = jnp.asarray(RNG.randn(n, h, w, c).astype(np.float32))
    kernels = jnp.asarray(RNG.randn(r, k, k, c).astype(np.float32) * 0.1)
    return x, kernels


def test_fused_matches_lax_convs():
    x, kernels = _data()
    rates = (2, 4, 6)
    got = multirate_atrous_depthwise(x, kernels, rates, interpret=True)
    want = multirate_atrous_depthwise_reference(x, kernels, rates)
    assert len(got) == 3
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w_), rtol=1e-4, atol=1e-4
        )


def test_fused_with_bn_relu():
    x, kernels = _data(c=136)  # exercises channel padding (136 -> 256)
    rates = (1, 3)
    kernels = kernels[:2]
    scale = jnp.asarray(RNG.rand(2, 136).astype(np.float32) + 0.5)
    bias = jnp.asarray(RNG.randn(2, 136).astype(np.float32))
    got = multirate_atrous_depthwise(
        x, kernels, rates, scale=scale, bias=bias, interpret=True
    )
    want = multirate_atrous_depthwise_reference(
        x, kernels, rates, scale=scale, bias=bias
    )
    for g, w_ in zip(got, want):
        assert float(jnp.min(g)) >= 0.0  # relu applied
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w_), rtol=1e-4, atol=1e-4
        )


def test_fused_batch_dim():
    x, kernels = _data(n=3, h=8, w=8, c=128)
    rates = (6, 12, 18)
    got = multirate_atrous_depthwise(x, kernels, rates, interpret=True)
    want = multirate_atrous_depthwise_reference(x, kernels, rates)
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w_), rtol=1e-4, atol=1e-4
        )


def test_fused_aspp_module_matches_standard():
    """ASPP fused-inference path must reproduce the standard path from the
    SAME variables (checkpoints unaffected)."""
    from deeplabv3p_tpu.models.factory import build_deeplab_model

    x = jnp.asarray(RNG.randn(1, 64, 64, 3).astype(np.float32))
    std = build_deeplab_model("mobilenetv2", 5, output_stride=16)
    fused = build_deeplab_model(
        "mobilenetv2", 5, output_stride=16, fused_aspp=True
    )
    variables = std.init(jax.random.PRNGKey(0), x)
    out_std = std.apply(variables, x, train=False)
    out_fused = fused.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_std), rtol=2e-4, atol=2e-4
    )
