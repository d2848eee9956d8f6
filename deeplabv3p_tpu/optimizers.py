"""Optimizers, LR schedules, weight averaging, and freeze masking (optax).

Ports the reference factory (/root/reference/common/model_utils.py:89-172)
onto optax:

* schedules — cosine (alpha=0.2), exponential (0.9, continuous),
  polynomial (end = lr/100, power 1), piecewise-constant with the 500-step
  warmup stage (model_utils.py:95-105);
* optimizers — SGD(momentum 0.9), Adam(eps 1e-7), RMSprop(rho 0.9)
  (model_utils.py:112-125), Keras epsilon conventions;
* weight averaging — EMA(0.99) / SWA(period 10) / Lookahead(6, 0.5)
  equivalents of the tfa wrappers (model_utils.py:157-170), implemented as
  a functional `AverageState` updated after each optimizer step (the tfa
  semantics of "swap in averaged weights at checkpoint time" map to
  `average_params`);
* freezing — reference freeze_level layer loops (model.py:106-115) become
  an `optax.multi_transform` that zeroes updates for frozen subtrees.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def get_lr_schedule(
    learning_rate: float, decay_type: Optional[str], decay_steps: int
) -> optax.Schedule:
    """LR schedule factory (reference get_lr_scheduler,
    model_utils.py:89-109)."""
    if decay_type:
        decay_type = decay_type.lower()

    if decay_type in (None, "none"):
        return optax.constant_schedule(learning_rate)
    if decay_type == "cosine":
        # final LR floor alpha=0.2 * learning_rate (model_utils.py:96)
        return optax.cosine_decay_schedule(
            init_value=learning_rate, decay_steps=decay_steps, alpha=0.2
        )
    if decay_type == "exponential":
        return optax.exponential_decay(
            init_value=learning_rate,
            transition_steps=decay_steps,
            decay_rate=0.9,
        )
    if decay_type == "polynomial":
        return optax.polynomial_schedule(
            init_value=learning_rate,
            end_value=learning_rate / 100.0,
            power=1.0,
            transition_steps=decay_steps,
        )
    if decay_type == "piecewise_constant":
        # warmup stage at 1e-3 for 500 steps, then lr, lr/10, lr/100
        # (model_utils.py:103-105)
        boundaries = [500, int(decay_steps * 0.9), decay_steps]
        values = [0.001, learning_rate, learning_rate / 10.0, learning_rate / 100.0]

        def schedule(count):
            count = jnp.asarray(count)
            idx = (
                (count >= boundaries[0]).astype(jnp.int32)
                + (count >= boundaries[1]).astype(jnp.int32)
                + (count >= boundaries[2]).astype(jnp.int32)
            )
            return jnp.asarray(values)[idx]

        return schedule
    raise ValueError(f"Unsupported lr decay type {decay_type!r}")


def build_optimizer(
    optim_type: str,
    learning_rate: float,
    decay_type: Optional[str] = "cosine",
    decay_steps: int = 100000,
    trainable_mask: Optional[Any] = None,
    state_dtype: Optional[str] = None,
) -> optax.GradientTransformation:
    """Optimizer factory (reference get_optimizer, model_utils.py:112-130),
    with optional freeze masking.

    trainable_mask: bool pytree matching params (True = trainable), from
    `deeplabv3p_tpu.models.factory.make_trainable_mask`.

    state_dtype: storage dtype for the optimizer's first-moment /
    momentum accumulator ('bfloat16' halves its HBM footprint and
    read+write traffic per step — an HBM-roofline lever for steps that
    train_phase_profile shows are bandwidth-bound; update math still
    runs in f32, only the carried state is cast). Adam's second moment
    stays f32 (squared-gradient dynamic range does not survive bf16's
    8-bit mantissa). None keeps full f32 state.
    """
    schedule = get_lr_schedule(learning_rate, decay_type, decay_steps)
    optim_type = optim_type.lower()
    acc_dtype = None
    if state_dtype not in (None, "float32", "f32"):
        acc_dtype = jnp.dtype(state_dtype)

    if optim_type == "adam":
        tx = optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-7,
                        mu_dtype=acc_dtype)
    elif optim_type == "rmsprop":
        if acc_dtype is not None:
            raise ValueError(
                "state_dtype is not supported for rmsprop (optax's "
                "scale_by_rms keeps its EMA-of-squares in f32; bf16 "
                "would lose the accumulator's dynamic range)"
            )
        tx = optax.rmsprop(schedule, decay=0.9, eps=1e-7, momentum=0.0, centered=False)
    elif optim_type == "sgd":
        tx = optax.sgd(schedule, momentum=0.9, nesterov=False,
                       accumulator_dtype=acc_dtype)
    else:
        raise ValueError(f"Unsupported optimizer type {optim_type!r}")

    if trainable_mask is not None:
        labels = jax.tree_util.tree_map(
            lambda t: "train" if t else "freeze", trainable_mask
        )
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels
        )
    return tx


class AverageState(NamedTuple):
    """Weight-averaging state (EMA / SWA / Lookahead). The averaging mode
    is static (compiled into the train step), NOT part of this pytree —
    only arrays live here so the state jits cleanly."""

    average: Any  # averaged (or slow) params; None when mode == 'none'
    count: jax.Array  # SWA: number of models averaged; lookahead: unused


EMA_DECAY = 0.99  # tfa MovingAverage average_decay (model_utils.py:164)
SWA_PERIOD = 10  # tfa SWA average_period (model_utils.py:166)
LOOKAHEAD_SYNC = 6  # tfa Lookahead sync_period (model_utils.py:168)
LOOKAHEAD_STEP = 0.5  # tfa Lookahead slow_step_size


def normalize_average_type(average_type: Optional[str]) -> str:
    mode = (average_type or "none").lower()
    if mode not in ("none", "ema", "swa", "lookahead"):
        raise ValueError(f"Unsupported average type {average_type!r}")
    return mode


def init_average(average_type: Optional[str], params: Any) -> AverageState:
    mode = normalize_average_type(average_type)
    avg = params if mode != "none" else None
    return AverageState(average=avg, count=jnp.zeros((), jnp.int32))


def apply_average(
    mode: Optional[str], state: AverageState, params: Any, step: jax.Array
) -> tuple[AverageState, Any]:
    """Post-optimizer-step averaging update; `mode` is static.

    Returns (new_state, params). For lookahead, params themselves are
    rewritten at sync boundaries; for EMA/SWA params pass through and the
    average lives in the state.
    """
    mode = normalize_average_type(mode)
    if mode == "none":
        return state, params

    if mode == "ema":
        avg = jax.tree_util.tree_map(
            lambda a, p: EMA_DECAY * a + (1.0 - EMA_DECAY) * p,
            state.average, params,
        )
        return state._replace(average=avg), params

    if mode == "swa":
        do_avg = (step % SWA_PERIOD) == 0
        n = state.count.astype(jnp.float32)
        avg = jax.tree_util.tree_map(
            lambda a, p: jnp.where(do_avg, (a * n + p) / (n + 1.0), a),
            state.average, params,
        )
        count = state.count + do_avg.astype(jnp.int32)
        return state._replace(average=avg, count=count), params

    # lookahead: slow += alpha * (fast - slow); fast = slow, every sync steps
    do_sync = (step % LOOKAHEAD_SYNC) == 0
    slow = jax.tree_util.tree_map(
        lambda s, p: jnp.where(do_sync, s + LOOKAHEAD_STEP * (p - s), s),
        state.average, params,
    )
    new_params = jax.tree_util.tree_map(
        lambda s, p: jnp.where(do_sync, s, p), slow, params
    )
    return state._replace(average=slow), new_params


def average_params(mode: Optional[str], state: AverageState, params: Any) -> Any:
    """Parameters to checkpoint/evaluate: the averaged weights when
    averaging is active (tfa AverageModelCheckpoint semantics,
    reference train.py:198-211), else the live params."""
    if normalize_average_type(mode) in ("ema", "swa"):
        return state.average
    return params
