"""Gradient accumulation (StageConfig.grad_accum / train.py --grad_accum).

optax.MultiSteps wraps the stage optimizer: k micro-batches accumulate a
mean gradient at FIXED params, then one inner update applies — the
numerics of a k*batch step without its activation memory. Pinned here:

  * params are bit-unchanged on accumulate-only micro-steps;
  * k identical micro-batches produce exactly the params of ONE plain
    step on that batch (mean of equal grads == the grad, evaluated at
    the same params — exact equality, not tolerance);
  * the LR schedule advances per APPLIED update, not per micro-step.

The reference has no counterpart (Keras fit() applies every batch);
this is a single-chip TPU feature for large effective batches.
"""

import jax
import jax.numpy as jnp
import pytest

from deeplabv3p_tpu.losses import get_loss_fn
from deeplabv3p_tpu.models.factory import build_deeplab_model
from deeplabv3p_tpu.parallel.mesh import make_mesh
from deeplabv3p_tpu.train import StageConfig, Trainer

pytestmark = pytest.mark.quick

NUM_CLASSES = 4
HW = 32


def _trainer(tmpdir):
    model = build_deeplab_model("mobilenetv2_lite", NUM_CLASSES)
    return Trainer(
        model, NUM_CLASSES, get_loss_fn("crossentropy"),
        mesh=make_mesh(1), log_dir=str(tmpdir),
    )


def _batch(seed=0, batch=2):
    k = jax.random.PRNGKey(seed)
    images = jax.random.normal(k, (batch, HW, HW, 3), jnp.float32)
    labels = jax.random.randint(
        jax.random.PRNGKey(seed + 1), (batch, HW, HW), 0, NUM_CLASSES
    )
    weights = jnp.ones((batch, HW, HW), jnp.float32)
    return images, labels, weights


def _params_equal(a, b):
    eq = jax.tree_util.tree_map(
        lambda x, y: bool((x == y).all()), a, b
    )
    return all(jax.tree_util.tree_leaves(eq))


def test_accumulate_steps_hold_params_then_match_plain_step(tmp_path):
    """freeze_level=2 keeps dropout deterministic (head in eval mode), so
    two identical micro-batches must reproduce the plain step EXACTLY.
    (At freeze_level<2 each micro-step draws a fresh dropout mask via
    fold_in(rng, step) — the standard, intended accumulation semantics —
    so exact equality only holds without dropout.)"""
    trainer = _trainer(tmp_path)
    images, labels, weights = _batch()

    plain = StageConfig(freeze_level=2, optim_type="sgd",
                        learning_rate=1e-2, decay_type=None)
    accum = StageConfig(freeze_level=2, optim_type="sgd",
                        learning_rate=1e-2, decay_type=None, grad_accum=2)

    state_p, tx_p = trainer.init_state((HW, HW), plain, batch_size=2)
    step_p = trainer.compile_train_step(tx_p, plain)
    # deep-copy: the compiled step donates its state arg, so the two
    # states must not share buffers
    copy = lambda t: jax.tree_util.tree_map(lambda x: jnp.array(x), t)
    state_a, tx_a = trainer.build_stage_state(
        copy(state_p.params), copy(state_p.batch_stats), accum
    )
    step_a = trainer.compile_train_step(tx_a, accum)

    params0 = copy(state_a.params)  # pre-donation snapshot
    state_a, _ = step_a(state_a, images, labels, weights, 1.0)
    assert _params_equal(state_a.params, params0), (
        "params moved on an accumulate-only micro-step"
    )
    state_a, _ = step_a(state_a, images, labels, weights, 1.0)
    assert not _params_equal(state_a.params, params0)

    state_p, _ = step_p(state_p, images, labels, weights, 1.0)
    # mean of two identical grads == the grad at the same params → the
    # applied update must equal one plain step exactly
    assert _params_equal(state_a.params, state_p.params)


def test_schedule_counts_applied_updates(tmp_path):
    """With cosine decay over decay_steps=2 applied updates, 4 micro
    steps at k=2 must land on the schedule's step-2 LR, not step-4."""
    import optax

    trainer = _trainer(tmp_path)
    images, labels, weights = _batch()
    accum = StageConfig(freeze_level=0, optim_type="sgd",
                        learning_rate=1e-2, decay_type="cosine",
                        decay_steps=2, grad_accum=2)
    state, tx = trainer.build_stage_state(
        *_init_params(trainer, accum), accum
    )
    step = trainer.compile_train_step(tx, accum)
    for _ in range(4):
        state, _ = step(state, images, labels, weights, 1.0)
    # MultiStepsState counts applied inner updates in gradient_step
    assert int(state.opt_state.gradient_step) == 2
    assert int(state.opt_state.mini_step) == 0


def _init_params(trainer, stage):
    s, _ = trainer.init_state((HW, HW), stage, batch_size=2)
    return s.params, s.batch_stats


def test_grad_accum_on_data_parallel_mesh(tmp_path):
    """MultiSteps state (accumulated grads + inner opt state) must ride
    the replicated out_shardings of the mesh train step: 8-device data
    mesh, k=2 — params bit-frozen after micro-step 1, moved after 2."""
    model = build_deeplab_model("mobilenetv2_lite", NUM_CLASSES)
    trainer = Trainer(
        model, NUM_CLASSES, get_loss_fn("crossentropy"),
        mesh=make_mesh(8), log_dir=str(tmp_path),
    )
    accum = StageConfig(freeze_level=0, optim_type="adam",
                        learning_rate=1e-3, grad_accum=2)
    state, tx = trainer.build_stage_state(
        *_init_params(trainer, accum), accum
    )
    step = trainer.compile_train_step(tx, accum)
    images, labels, weights = _batch(batch=8)
    from deeplabv3p_tpu.parallel.mesh import shard_batch

    images, labels, weights = shard_batch(
        trainer.mesh, (images, labels, weights)
    )
    copy = lambda t: jax.tree_util.tree_map(lambda x: jnp.array(x), t)
    params0 = copy(state.params)
    state, m = step(state, images, labels, weights, 1.0)
    assert bool(jnp.isfinite(m["loss"]))
    assert _params_equal(state.params, params0)
    state, _ = step(state, images, labels, weights, 1.0)
    assert not _params_equal(state.params, params0)
