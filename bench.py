#!/usr/bin/env python3
"""Benchmark: the reference's full headline matrix on real TPU hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "configs": {...}}

Primary metric (unchanged across rounds): single-image inference
steady-state latency for MobileNetV2-Lite 512x512 OS16 — the reference's
published headline on this exact config is 23 ms on a Titan XP
(/root/reference/README.md:316, BASELINE.md). vs_baseline = 23 / ours.

The "configs" dict carries the full matrix (VERDICT r1 item #2):
  * batch-1 inference ms + batch-8 throughput for xception / resnet50 /
    mobilenetv2 / mobilenetv2_lite (bf16, fused ASPP+decoder kernels);
  * train images/sec/chip for mobilenetv2_lite (b16) and xception (b8);
  * MFU for every entry, from the compiled program's own XLA cost
    analysis and the chip's bf16 peak;
  * an estimated ratio vs the TF reference's train throughput. The
    reference never published one, so it is ESTIMATED from its published
    single-image inference latency as train_ms ≈ 3x infer_ms (fwd+bwd ≈
    3x fwd FLOPs, perfectly overlapped input pipeline — a GENEROUS upper
    bound for the reference, whose loader is single-threaded Python,
    train.py:184-185). The north star is ≥2x (BASELINE.json).
  * cli_train: end-to-end `Trainer.fit` throughput through the real
    host pipeline (on-disk JPEG decode → threaded prefetch → device feed
    → fused augment+train step) on a synthetic on-disk dataset, plus the
    measured pure-decode ceiling of this host (VERDICT r1 item #4).

Timing methodology: steady-state chained dispatch (each call's input
derives from the previous output on device) — immune to the tunnel's
duplicate-dispatch caching; sync p50 reported for reference (it carries
~20-25 ms of pure tunnel RPC that an on-host deployment does not pay).
"""

import hashlib
import json
import os
import sys
import tempfile
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

# Published single-image Keras latencies, Titan XP (README.md:312-316).
BASELINE_INFER_MS = {
    "xception": 59.0,
    "resnet50": 38.0,
    "mobilenetv2_lite": 23.0,
    # remaining published rows (BASELINE.md / reference README.md:314-317)
    "mobilenetv3large": 29.0,
    "peleenet_lite": 37.8,
    "mobilenetv3small_lite": 20.0,
}
PRIMARY = "mobilenetv2_lite"

# bf16 peak FLOP/s per chip by TPU generation (public spec sheets).
PEAK_BF16 = {
    "v5 lite": 197e12,  # v5e
    "v5e": 197e12,
    "v5p": 459e12,
    "v4": 275e12,
    "v6": 918e12,  # trillium
}


_LOG_T0 = time.time()


def log(msg):
    # elapsed-seconds stamp: section-wall attribution when tuning the
    # per-section budget estimates (stderr only; never in the stdout tail)
    print(f"# [{time.time() - _LOG_T0:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


# ---------------------------------------------------------------------------
# Rig resilience: the tunneled TPU client can wedge for 15-70 min
# (UNAVAILABLE on backend init) and a process whose backend dies mid-run
# can hang at interpreter exit while still holding the client. The bench
# must never turn that into "no result recorded": a global watchdog
# emits the JSON line with whatever configs completed and hard-exits.
#
# Round-4 post-mortem (VERDICT r4 #1): the driver kills the bench at its
# OWN deadline (<38 min; rc=124) and parses NOTHING from the output tail
# — checkpoints do not rescue a kill, only a clean rc=0 exit before the
# driver deadline yields a parsed record. Defense is therefore two-layer:
#   1. a per-section BUDGETER (_budget_ok) that never STARTS a section
#      whose cold-cache cost doesn't fit the remaining budget — the bench
#      finishes early with whatever landed, rc=0;
#   2. the watchdog as backstop for a single section overrunning its
#      estimate (wedged tunnel, pathological compile).
# The default budget is sized WELL under every observed driver deadline
# and all cost estimates assume a COLD compile cache (freshly provisioned
# rig — ROUND3_NOTES session-5 finding).
# ---------------------------------------------------------------------------
WATCHDOG_DEFAULT_MIN = 20.0

_EMITTED = threading.Event()
_PARTIAL = {"configs": {}, "peak": None, "n_chips": None, "device": None}
_DEADLINE = [float("inf")]
_T0 = [0.0]
_SKIPPED = []
# sections started so far: [(section, est_cold_min, t_start), ...].
# Sections run strictly sequentially, so every entry but the last is
# complete by the time the next gate runs — that gives the adaptive
# scale below its actual-vs-estimate data.
_STARTED = []

# adaptive-scale clamp: never assume better than 2.5x the cold estimate
# (a warm rig measured ~0.64 in round 5 run 4; 0.4 leaves margin for a
# late section whose executable alone missed the cache), never worse
# than the cold estimate itself.
_SCALE_MIN = 0.4


def _remaining_min() -> float:
    return (_DEADLINE[0] - time.time()) / 60.0


def _est_scale() -> float:
    """Warm-cache adaptivity (round-5): cost estimates are sized for a
    COLD compile cache, so on a warm rig the raw gates skip sections that
    would comfortably fit (run 4 measured actual/estimate ~= 0.64 warm).
    Scale later estimates by the observed ratio over COMPLETED sections,
    clamped to [_SCALE_MIN, 1.0]. Cold rigs observe ratio ~1 and keep the
    conservative plan; the 20-min watchdog (rc=0 partial emit) remains
    the backstop if the scale ever under-budgets."""
    if len(_STARTED) < 2:
        return 1.0
    # sections run sequentially: every entry but the last is complete,
    # and their combined wall is start-of-first .. start-of-last
    elapsed_min = (_STARTED[-1][2] - _STARTED[0][2]) / 60.0
    total_est = sum(e for _, e, _ in _STARTED[:-1])
    if total_est <= 0 or elapsed_min <= 0:
        return 1.0
    return max(_SCALE_MIN, min(1.0, elapsed_min / total_est))


def _note_section(section: str, est_cold_min: float):
    """Record a section start for the adaptive scale (used directly for
    the one ungated section; _budget_ok calls it for gated ones)."""
    _STARTED.append((section, est_cold_min, time.time()))


def _budget_ok(section: str, est_cold_min: float) -> bool:
    """Gate a section on its cost estimate vs remaining budget (plus
    margin for the final emit). Estimates are cold-cache walls scaled by
    the observed warm-rig ratio (_est_scale). Skipping is recorded in the
    JSON so a thin record is diagnosable."""
    rem = _remaining_min()
    est = est_cold_min * _est_scale()
    if rem < est + 1.0:
        log(f"SKIP section {section}: ~{est:.1f} min scaled estimate "
            f"(cold {est_cold_min:.0f}) vs {rem:.1f} min remaining")
        _SKIPPED.append(section)
        return False
    _note_section(section, est_cold_min)
    return True


def _exc_line(exc) -> str:
    """One-line error summary: XLA OOMs append a ~100-line allocation
    report that must never reach the captured output tail (BENCH_r03
    lesson) — keep the first line only, truncated."""
    first = (str(exc).splitlines() or [""])[0]
    return f"{type(exc).__name__}: {first[:160]}"


def _render_result(partial=False):
    configs = _PARTIAL["configs"]
    lite = configs.get(PRIMARY, {})
    infer_ms = lite.get("infer_b1_ms")
    out = {
        "metric": f"{PRIMARY}_512_infer_ms_per_image",
        "value": infer_ms,
        "unit": "ms",
        "vs_baseline": round(BASELINE_INFER_MS[PRIMARY] / infer_ms, 3)
        if infer_ms else None,
        "train_images_per_sec_per_chip": lite.get(
            "train_images_per_sec_per_chip"
        ),
        "train_speedup_vs_est_tf": lite.get("train_speedup_vs_est_tf"),
        "peak_bf16_tflops": (_PARTIAL["peak"] or 0) / 1e12 or None,
        "n_chips": _PARTIAL["n_chips"],
        "device": _PARTIAL["device"],
        "configs": configs,
    }
    if _SKIPPED:
        out["sections_skipped"] = list(_SKIPPED)
    if len(_STARTED) >= 2:
        out["budget_scale"] = round(_est_scale(), 2)
    if _T0[0]:
        out["elapsed_min"] = round((time.time() - _T0[0]) / 60.0, 1)
    if partial:
        out["watchdog_timeout"] = True
    return out


def _emit(partial=False):
    """Print the final one-line JSON result exactly once."""
    if _EMITTED.is_set():
        return
    _EMITTED.set()
    print(json.dumps(_render_result(partial)), flush=True)


def _checkpoint(section: str):
    """Re-emit the full JSON line after EVERY completed section: the
    driver reads the output tail and the LAST line wins, so a driver-side
    kill (rc=124, the round-3 failure mode) still leaves the newest
    complete snapshot on stdout. The final `_emit` prints the same shape
    and suppresses further checkpoints."""
    if _EMITTED.is_set():
        return
    out = _render_result()
    out["sections_done"] = section
    print(json.dumps(out), flush=True)
    log(f"checkpoint emitted after section: {section}")


def _watchdog_fire():
    log("WATCHDOG: bench exceeded its budget — emitting partial results")
    _emit(partial=True)
    os._exit(0)


def _init_devices_with_retry(max_wait_min: float):
    """jax.devices() with patient retries: a wedged tunnel recovers on
    the order of tens of minutes, so waiting can rescue the round's
    bench where failing fast records nothing."""
    deadline = time.time() + max_wait_min * 60
    delay = 60.0
    while True:
        try:
            return jax.devices()
        except RuntimeError as exc:
            if time.time() > deadline:
                raise
            log(f"backend init failed ({str(exc).splitlines()[-1][:120]}); "
                f"retrying in {delay:.0f}s")
            time.sleep(delay)
            delay = min(delay * 1.5, 300.0)


def chip_peak_flops() -> float:
    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    for key, peak in PEAK_BF16.items():
        if key in kind:
            return peak
    return 197e12  # default to v5e


def _flops_cache_path():
    d = os.path.expanduser("~/.cache/deeplabv3p_tpu")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, "flops_cache.json")


def _compiled_flops(jitted, *args) -> float:
    """FLOPs via XLA cost analysis, memoized on disk keyed by the SHA-256
    of the LOWERED program text. lower() is client-side and cheap, but
    .compile() here is an AOT compile the persistent executable cache
    does NOT serve — measured 224 s for the xception predict program on
    a warm rig (round 5, stage probe). FLOPs are a deterministic
    function of the lowered program, so the hash key is exact and the
    memo never goes stale: any model/shape change changes the HLO."""
    try:
        traced = jitted.trace(*args)
        # key on the JAXPR pretty-print: op/shape structure only —
        # closed-over weights appear as constvars by NAME, not value
        # (the lowered HLO text inlines them as literal blobs: xception
        # predict took >13 min to stringify; the jaxpr is ~0.1 MB/0.1 s)
        key = hashlib.sha256(
            str(traced.jaxpr).encode()
        ).hexdigest()[:32]
        path = _flops_cache_path()
        try:
            with open(path) as f:
                memo = json.load(f)
        except Exception:
            memo = {}
        if key in memo:
            return float(memo[key])
        cost = traced.lower().compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        memo[key] = flops
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(memo, f)
        os.replace(tmp, path)
        return flops
    except Exception as e:  # cost analysis is best-effort
        log(f"cost_analysis failed: {e}")
        return 0.0


def _median_ms(fn, *args, warmup=3, iters=20):
    """Synchronous per-call latency (includes host<->device round trip
    AND result readback — block_until_ready alone does not wait for
    execution through the tunnel, see _steady_state_ms)."""
    for _ in range(warmup):
        np.asarray(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(times))


def _steady_state_ms(chain_fn, x0, warmup=3, iters=24, compiler_options=None):
    """Honest steady-state ms/step on the tunneled client.

    Round-3 finding: through this tunnel `jax.block_until_ready` is
    effectively a no-op (returns before the device has executed the
    queued dispatches), so any host-side chained loop can time pure
    ENQUEUE cost — we measured physically impossible numbers (resnet50
    b32 train at "2.9 ms"/step = 12x apparent MFU; the same program is
    152 ms/step when a value is actually fetched). Only device_get of a
    VALUE is unfakeable.

    Recipe: run K steps inside ONE `lax.scan` dispatch whose final carry
    feeds a scalar probe; fetch the probe (forces execution of all K
    sequential iterations — each depends on the previous carry). Time
    fetch-closed calls at lengths K and 2K and report (T_2K - T_K)/K:
    the difference cancels the per-call RPC + fetch cost.

    chain_fn(x) -> (result, next_x) with next_x derived on device
    (result is ignored inside the scan).

    compiler_options (optional dict) is applied to the jit of the scan
    program — the channel for backend-flag A/B experiments: client-side
    XLA_FLAGS is parsed by the LOCAL (CPU) XLA build, which fatally
    rejects TPU-only flags, whereas env_option_overrides ride the
    serialized compile request to the backend's compiler.
    """
    k = max(4, iters // 2)

    # ONE program with the window length as a DEVICE scalar (fori_loop
    # -> while loop with a dynamic trip count): both the K- and 2K-step
    # windows execute the bit-identical executable, so the (T_2K - T_K)
    # difference cancels every per-invocation cost by construction — and
    # each leg pays one program trace/load instead of two (round 5: a
    # warm load of a big program through the tunnel is ~45 s; two static
    # scan programs doubled it).
    def body(_, c):
        _, nxt = chain_fn(c)
        return nxt

    def run(c, n):
        c2 = jax.lax.fori_loop(0, n, body, c)
        leaf = jax.tree_util.tree_leaves(c2)[0]
        return jnp.sum(leaf.astype(jnp.float32)), c2

    run = jax.jit(run, compiler_options=compiler_options)
    n_k = jnp.asarray(k, jnp.int32)
    n_2k = jnp.asarray(2 * k, jnp.int32)

    def run_k(c):
        return run(c, n_k)

    def run_2k(c):
        return run(c, n_2k)

    # compile + warm both window lengths (fetch-closed)
    for _ in range(warmup):
        p, x0 = run_k(x0)
        float(p)
    p, x0 = run_2k(x0)
    float(p)

    # Median of THREE window pairs: for sub-ms kernels the K-step window
    # (~10-20 ms of device time) rides on a ~50 ms tunnel RPC whose
    # jitter can dominate a single (T_2K - T_K) difference — round 4
    # caught a 4x outlier on the mnv2-lite b1 leg this way.
    diffs = []
    for _ in range(3):
        t0 = time.perf_counter()
        p, x0 = run_k(x0)
        float(p)
        t_k = time.perf_counter() - t0

        t0 = time.perf_counter()
        p, x0 = run_2k(x0)
        float(p)
        t_2k = time.perf_counter() - t0
        diffs.append(max(t_2k - t_k, 1e-9) * 1e3 / k)
    return float(np.median(diffs))


def _build_infer_model(model_type: str, hw, batch, num_classes,
                       output_stride):
    """(model, variables) for the inference legs — split out so one
    family's b1/b8 legs share ONE jit(init) (params are batch-shape
    independent; each init program costs a ~25 s trace+load through the
    tunnel — round-5 stage probe)."""
    from deeplabv3p_tpu.models.factory import build_deeplab_model

    model = build_deeplab_model(
        model_type, num_classes, output_stride=output_stride,
        dtype=jnp.bfloat16, fused_aspp=True,
    )
    x = jnp.zeros((batch, hw, hw, 3), jnp.float32)
    t = time.perf_counter()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    log(f"    [stage] init {time.perf_counter() - t:.1f}s")
    return model, variables


def bench_inference(model_type: str, hw=512, batch=1, num_classes=21,
                    iters=50, output_stride=16, built=None):
    """Returns (steady ms/img, sync p50 ms/call, fwd GFLOPs/img).
    `built` (optional) is a prebuilt (model, variables) pair shared
    across legs of one family."""
    model, variables = built or _build_infer_model(
        model_type, hw, batch, num_classes, output_stride
    )
    x = jnp.zeros((batch, hw, hw, 3), jnp.float32)

    @jax.jit
    def predict(images):
        logits = model.apply(variables, images, train=False)
        return jnp.argmax(logits, axis=-1)

    @jax.jit
    def predict_chain(images):
        mask = predict(images)
        nxt = images + mask[..., None].astype(jnp.float32) * 1e-6
        return mask, nxt

    t = time.perf_counter()
    flops = _compiled_flops(predict, x)
    log(f"    [stage] flops-analysis {time.perf_counter() - t:.1f}s")
    t = time.perf_counter()
    steady = _steady_state_ms(predict_chain, x, iters=iters) / batch
    log(f"    [stage] steady-chain {time.perf_counter() - t:.1f}s")
    t = time.perf_counter()
    sync = _median_ms(predict, x) if batch == 1 else float("nan")
    log(f"    [stage] sync-median {time.perf_counter() - t:.1f}s")
    return steady, sync, flops / batch / 1e9


def bench_train_throughput(model_type: str, hw=512, batch=16,
                           num_classes=21, iters=10, fused_loss=False,
                           remat=False, state_dtype=None,
                           compiler_options=None):
    """Returns (images/sec/chip, step GFLOPs) for the full jitted
    fwd+bwd+optimizer+metrics step. fused_loss routes the loss tail
    through the Pallas upsample+CE kernel (ops/pallas/upsample_ce.py);
    remat rematerializes backbone activations (the train step is
    HBM-bandwidth-saturated at ~4% MFU per train_phase_profile, so
    recomputing forward activations in the bwd trades idle MXU FLOPs
    for the bound resource)."""
    from deeplabv3p_tpu.losses import get_loss_fn
    from deeplabv3p_tpu.models.factory import build_deeplab_model
    from deeplabv3p_tpu.parallel.mesh import make_mesh
    from deeplabv3p_tpu.train import StageConfig, Trainer

    mesh = make_mesh(1)
    model = build_deeplab_model(
        model_type, num_classes, output_stride=16, dtype=jnp.bfloat16,
        remat=remat,
    )
    trainer = Trainer(
        model, num_classes, get_loss_fn("crossentropy"), mesh=mesh,
        log_dir=tempfile.mkdtemp(prefix="bench_logs_"),
        fused_loss=fused_loss,
    )
    stage = StageConfig(freeze_level=0, optim_type="sgd", learning_rate=1e-3,
                        decay_type="cosine", decay_steps=1000,
                        state_dtype=state_dtype)
    state, tx = trainer.init_state((hw, hw), stage, batch_size=batch)
    train_step = trainer.compile_train_step(tx, stage)

    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (batch, hw, hw, 3), jnp.float32)
    labels = jnp.zeros((batch, hw, hw), jnp.int32)
    weights = jnp.ones((batch, hw, hw), jnp.float32)

    flops = _compiled_flops(train_step, state, images, labels, weights, 1.0)

    # Honest chained timing (see _steady_state_ms): images for step i+1
    # derive from step i's loss, every warmup step is closed by a value
    # fetch, and the reported time is the difference of two fetch-closed
    # windows. Plain block_until_ready after warmup measured physically
    # impossible numbers on this rig (e.g. 2.9 "ms"/step for resnet50
    # b32 vs 152 ms real — >1 apparent MFU).
    @jax.jit
    def chain(carry):
        st, imgs = carry
        st, m = train_step(st, imgs, labels, weights, 1.0)
        return m["loss"], (st, imgs + m["loss"] * 1e-12)

    ms = _steady_state_ms(chain, (state, images), warmup=3,
                          iters=max(6, iters),
                          compiler_options=compiler_options)
    return batch / (ms / 1e3), flops / 1e9


def bench_cli_pipeline(hw=512, batch=8, n_images=128, num_classes=21):
    """End-to-end host-pipeline throughput: on-disk JPEGs → threaded
    decode/resize → device_feed staging → ONE fused augment+train dispatch
    per step (the real `train.py` path), plus this host's pure-decode
    ceiling. Returns (cli img/s, decode img/s)."""
    from PIL import Image

    from deeplabv3p_tpu.data.augment import AugmentConfig, augment_batch
    from deeplabv3p_tpu.data.pipeline import SegmentationDataset
    from deeplabv3p_tpu.losses import get_loss_fn
    from deeplabv3p_tpu.models.factory import build_deeplab_model
    from deeplabv3p_tpu.parallel.mesh import make_mesh
    from deeplabv3p_tpu.train import StageConfig, Trainer

    root = tempfile.mkdtemp(prefix="bench_ds_")
    os.makedirs(os.path.join(root, "images"))
    os.makedirs(os.path.join(root, "labels"))
    rng = np.random.RandomState(0)
    ids = []
    for i in range(n_images):
        img = rng.randint(0, 255, (hw, hw, 3), np.uint8)
        lbl = rng.randint(0, num_classes, (hw, hw), np.uint8)
        Image.fromarray(img).save(
            os.path.join(root, "images", f"b{i}.jpg"), quality=90
        )
        Image.fromarray(lbl).save(os.path.join(root, "labels", f"b{i}.png"))
        ids.append(f"b{i}")

    ds = SegmentationDataset(
        root, ids, batch_size=batch, num_classes=num_classes,
        input_shape=(hw, hw), augment=False, shuffle=True,
    )

    # Pure decode ceiling of this host (what the CLI number is bound by).
    # The benchmark rig's CPU share is bursty (identical decode epochs
    # measure 27..130 img/s back to back), so take the best of two
    # windows — same policy as the steady-epoch pick below, keeping the
    # cli/ceiling ratio comparable instead of hostage to scheduler luck.
    decode_ips = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        n = 0
        for images_u8, _, _ in ds.epoch_batches():
            n += images_u8.shape[0]
        decode_ips = max(decode_ips, n / (time.perf_counter() - t0))

    aug_cfg = AugmentConfig()

    def augment_fn(key, images, labels, orig_hw):
        return augment_batch(
            key, jnp.asarray(images), jnp.asarray(labels),
            jnp.asarray(orig_hw), aug_cfg, num_classes=num_classes,
        )

    model = build_deeplab_model(
        "mobilenetv2_lite", num_classes, output_stride=16,
        dtype=jnp.bfloat16,
    )
    trainer = Trainer(
        model, num_classes, get_loss_fn("crossentropy"), mesh=make_mesh(1),
        log_dir=tempfile.mkdtemp(prefix="bench_logs_"),
    )
    stage = StageConfig(freeze_level=0, optim_type="sgd",
                        learning_rate=1e-3, epochs=3)
    # epoch 1 pays compile; epochs 2-3 are steady state
    t_marks = []

    class _TimingDataset:
        def __init__(self, inner):
            self.inner = inner

        def epoch_batches(self):
            t_marks.append(time.perf_counter())
            return self.inner.epoch_batches()

    trainer.fit(_TimingDataset(ds), [stage], augment_fn=augment_fn)
    t_marks.append(time.perf_counter())

    # packed-shard path (VERDICT r2 item #2): decode once, then epochs
    # stream mmap'd uint8 — the per-step JPEG decode ceiling disappears
    from deeplabv3p_tpu.data.shards import ShardedDataset, pack_shards

    shard_dir = tempfile.mkdtemp(prefix="bench_shards_")
    pack_shards(ds, shard_dir)
    sds = ShardedDataset(shard_dir, batch_size=batch)
    p_marks = []

    class _TimingShards:
        def epoch_batches(self):
            p_marks.append(time.perf_counter())
            return sds.epoch_batches()

        def __len__(self):
            return len(sds)

    trainer2 = Trainer(
        model, num_classes, get_loss_fn("crossentropy"), mesh=make_mesh(1),
        log_dir=tempfile.mkdtemp(prefix="bench_logs_"),
    )
    trainer2.fit(_TimingShards(), [stage], augment_fn=augment_fn)
    p_marks.append(time.perf_counter())
    packed_secs = [p_marks[-2] - p_marks[-3], p_marks[-1] - p_marks[-2]]
    packed_best = len(sds) * batch / min(packed_secs)
    packed_mean = len(sds) * batch * len(packed_secs) / sum(packed_secs)

    # device-resident path (data/device_cache.py): the whole uint8 set
    # uploaded once, per-step host traffic = B int32 indices — the host
    # decode AND the tunnel transfer drop out of the loop entirely
    from deeplabv3p_tpu.data.device_cache import DeviceCachedDataset

    dds = DeviceCachedDataset.from_source(sds)
    d_marks = []

    class _TimingDev:
        def epoch_batches(self):
            d_marks.append(time.perf_counter())
            return dds.epoch_batches()

        def __len__(self):
            return len(dds)

    trainer3 = Trainer(
        model, num_classes, get_loss_fn("crossentropy"), mesh=make_mesh(1),
        log_dir=tempfile.mkdtemp(prefix="bench_logs_"),
    )
    trainer3.fit(_TimingDev(), [stage], augment_fn=augment_fn)
    d_marks.append(time.perf_counter())
    dev_secs = [d_marks[-2] - d_marks[-3], d_marks[-1] - d_marks[-2]]
    dev_best = len(dds) * batch / min(dev_secs)
    dev_mean = len(dds) * batch * len(dev_secs) / sum(dev_secs)
    # marks: [init-probe, epoch0(compile), epoch1, epoch2, end] — fit's
    # shape probe also calls epoch_batches(), hence the extra first mark.
    # Report BOTH the best and the mean steady epoch (ADVICE r2: the
    # best-window pick must be visible in the data): the rig's bursty CPU
    # share makes per-epoch walls swing >2x; best-window matches the
    # best-of-2 decode-ceiling policy above.
    epoch_secs = [t_marks[-2] - t_marks[-3], t_marks[-1] - t_marks[-2]]
    steps_per_epoch = len(ds)
    cli_ips = steps_per_epoch * batch / min(epoch_secs)
    cli_ips_mean = steps_per_epoch * batch * len(epoch_secs) / sum(epoch_secs)
    return (cli_ips, cli_ips_mean, decode_ips, packed_best, packed_mean,
            dev_best, dev_mean)


def bench_int8(model_type: str, hw=512, batch=1, num_classes=21, iters=25):
    """Native int8 inference (export/quantize.py make_int8_apply):
    calibrated int8x int8→int32 pointwise convs on the MXU. Returns
    steady ms/img (VERDICT r2 item #5: int8 measured, win or negative)."""
    from deeplabv3p_tpu.export.quantize import (
        calibrate_conv_inputs,
        make_int8_apply,
    )
    from deeplabv3p_tpu.models.factory import build_deeplab_model

    model = build_deeplab_model(
        model_type, num_classes, output_stride=16, dtype=jnp.bfloat16
    )
    x = jnp.zeros((batch, hw, hw, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    # calibration on-device random batches (large host->device transfers
    # wedge the tunnel — CLAUDE.md rule 7)
    calib = [
        jax.random.uniform(
            jax.random.PRNGKey(i), (1, hw, hw, 3), jnp.float32,
            minval=-1.0, maxval=1.0,
        )
        for i in range(2)
    ]
    absmax = calibrate_conv_inputs(model, variables, calib)
    int8_fn = make_int8_apply(model, variables, absmax)

    @jax.jit
    def predict_chain(images):
        mask = jnp.argmax(int8_fn(images), axis=-1)
        nxt = images + mask[..., None].astype(jnp.float32) * 1e-6
        return mask, nxt

    return _steady_state_ms(predict_chain, x, iters=iters) / batch


def bench_eval_throughput(model_type="mobilenetv2_lite", hw=512, batch=8,
                          num_classes=21, iters=25):
    """Fused eval-step throughput: uint8 batch → normalize + forward +
    argmax + one-hot-matmul confusion + accumulate in ONE XLA program
    (VERDICT r2 item #6). Returns images/sec."""
    from deeplabv3p_tpu.models.factory import build_deeplab_model
    from deeplabv3p_tpu.train import make_eval_step

    model = build_deeplab_model(
        model_type, num_classes, output_stride=16, dtype=jnp.bfloat16,
        fused_aspp=True,
    )
    x0 = jnp.zeros((1, hw, hw, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
    eval_step = make_eval_step(model, num_classes)

    images_u8 = jax.random.randint(
        jax.random.PRNGKey(0), (batch, hw, hw, 3), 0, 256, jnp.uint8
    )
    labels_u8 = jax.random.randint(
        jax.random.PRNGKey(1), (batch, hw, hw), 0, num_classes, jnp.uint8
    )

    # the image input must depend on the accumulated cm (carry) or XLA
    # hoists the loop-invariant forward pass out of the timing scan
    # (measured eval "throughput" above pure inference throughput)
    def chain(carry):
        cm, imgs = carry
        cm2 = cm + eval_step(variables, imgs, labels_u8)
        nudge = (cm2[0, 0] % 2).astype(jnp.uint8)
        return cm2, (cm2, imgs + nudge)

    cm0 = jnp.zeros((num_classes, num_classes), jnp.int32)
    ms = _steady_state_ms(chain, (cm0, images_u8), warmup=3, iters=iters)
    return batch / (ms / 1e3)


def bench_crf(hw=512, num_classes=21, n_iters=5, iters=10):
    """Dense-CRF mean-field postprocess (C19) steady-state ms/image on
    the device. The reference executes this CPU-side through pydensecrf
    (postprocess_np.py:10-28) and SURVEY.md flags it as the inference
    pipeline's CPU hot spot; crf_inference is the TPU message-passing
    kernel SURVEY §7 targets (gaussian conv + bilateral grid, symmetric
    pydensecrf normalization — parity pinned by tests/test_crf_parity.py).
    Unaries + image are generated on device (CLAUDE.md rule 7)."""
    from deeplabv3p_tpu.postprocess import crf_inference

    image = jax.random.uniform(
        jax.random.PRNGKey(0), (hw, hw, 3), jnp.float32, 0.0, 255.0
    )
    unary = jax.random.normal(
        jax.random.PRNGKey(1), (hw, hw, num_classes), jnp.float32
    )

    def chain(u):
        q = crf_inference(u, image, n_iters=n_iters)
        return q, u + q * 1e-6  # next unary depends on this result

    return _steady_state_ms(chain, unary, warmup=2, iters=iters)


def bench_native_cli(hw=512, model="mobilenetv2_lite", count=10):
    """Pure-C++ onnx engine invoke latency at the reference's published
    on-device comparison point (512x512x21 fp32 — reference
    inference/README.md:137,301: MNN 111.68 ms / TFLite 428.07 ms, both
    x86 4-thread). Runs entirely on the host CPU, no TPU involvement.
    Builds the binary and exports the .onnx on first use; both are
    cached (build dir / ~/.cache) so warm reruns cost only the invokes.
    """
    import re
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    build = os.path.join(repo, "inference", "build")
    binary = os.path.join(build, "deeplabSegment")
    if not os.path.exists(binary):
        subprocess.run(
            ["cmake", "-S", os.path.join(repo, "inference"), "-B", build],
            check=True, capture_output=True, timeout=300)
        subprocess.run(["cmake", "--build", build, "-j", "1"],
                       check=True, capture_output=True, timeout=900)
    cache = os.path.expanduser("~/.cache/deeplabv3p_tpu")
    os.makedirs(cache, exist_ok=True)
    onnx = os.path.join(cache, f"native_bench_{model}_{hw}.onnx")
    if not os.path.exists(onnx):
        subprocess.run(
            [sys.executable,
             os.path.join(repo, "tools", "misc",
                          "export_native_bench_model.py"),
             onnx, model, str(hw)],
            check=True, capture_output=True, timeout=900)
    res = subprocess.run(
        [binary, "--model_path", onnx,
         "--image", os.path.join(repo, "example", "2007_000039.jpg"),
         "--output", os.path.join(tempfile.gettempdir(),
                                  "native_bench_mask.png"),
         "--warmup_runs", "2", "--count", str(count)],
        check=True, capture_output=True, text=True, timeout=600)
    m = re.search(r"invoke average time: ([0-9.]+) ms", res.stdout)
    if not m:
        raise RuntimeError("no invoke timing in CLI output: " +
                           res.stdout[-300:])
    return float(m.group(1))


def bench_learn(max_epochs=120, target=0.95):
    """End-to-end LEARNING proof on the device (VERDICT r2 item #1):
    overfit the vendored example/ pairs (+augmented copies) with the
    flagship DeepLabV3+ MobileNetV2, then score the TRAINED weights with
    the real eval pipeline. Returns (train_miou, epochs_run, seconds)."""
    from deeplabv3p_tpu.data.augment import AugmentConfig, augment_batch
    from deeplabv3p_tpu.data.pipeline import SegmentationDataset
    from deeplabv3p_tpu.data.toy import CLASS_NAMES, build_overfit_dataset
    from deeplabv3p_tpu.eval import eval_miou
    from deeplabv3p_tpu.losses import get_loss_fn
    from deeplabv3p_tpu.models.factory import build_deeplab_model
    from deeplabv3p_tpu.parallel.mesh import make_mesh
    from deeplabv3p_tpu.train import StageConfig, Trainer
    from deeplabv3p_tpu.utils.config import get_data_list

    root = tempfile.mkdtemp(prefix="bench_learn_")
    list_path = build_overfit_dataset(root)
    ids = get_data_list(list_path)
    num_classes = len(CLASS_NAMES)
    hw = 256

    ds = SegmentationDataset(
        root, ids, batch_size=8, num_classes=num_classes,
        input_shape=(hw, hw), augment=False, shuffle=True,
    )
    model = build_deeplab_model(
        "mobilenetv2", num_classes, output_stride=16, dtype=jnp.bfloat16
    )
    trainer = Trainer(
        model, num_classes, get_loss_fn("crossentropy"),
        use_sample_weights=True, mesh=make_mesh(1),
        log_dir=tempfile.mkdtemp(prefix="bench_learn_logs_"),
    )
    aug_cfg = AugmentConfig.identity()  # deterministic; adaptive weights on

    def augment_fn(key, images, labels, orig_hw):
        return augment_batch(
            key, jnp.asarray(images), jnp.asarray(labels),
            jnp.asarray(orig_hw), aug_cfg, num_classes=num_classes,
        )

    stages = [
        StageConfig(freeze_level=1, optim_type="adam", learning_rate=1e-3,
                    epochs=2),
        StageConfig(freeze_level=0, optim_type="adam", learning_rate=1e-3,
                    decay_type="cosine", decay_steps=max_epochs,
                    epochs=max_epochs - 2),
    ]
    t0 = time.perf_counter()
    state = trainer.fit(ds, stages, augment_fn=augment_fn)
    secs = time.perf_counter() - t0
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    # short run vs the 0.999-momentum BN EMA horizon: finalize with exact
    # train-set statistics (train.py --bn_recalibrate path)
    from deeplabv3p_tpu.train import recalibrate_batch_stats

    calib = SegmentationDataset(
        root, ids, batch_size=8, num_classes=num_classes,
        input_shape=(hw, hw), augment=False, shuffle=False,
    )
    variables = recalibrate_batch_stats(
        model, variables, calib.epoch_batches(), num_classes
    )
    m = eval_miou(
        model, variables, root, ids, list(CLASS_NAMES),
        model_input_shape=(hw, hw), batch_size=8, plots=False,
    )
    return float(m.miou), sum(s.epochs for s in stages), secs


# Batch-scaling points, run late (gated per leg). xception b32 OOM'd in
# the round-3 driver run (16 GB v5e HBM), spraying a 100-line allocation
# dump — killed; its scaling story is b8→b16 (~flat, conv-efficiency-
# bound, see ROUND5_NOTES phase rooflines).
SCALING = {
    "mobilenetv2_lite": (32, 64),
    "xception": (16,),
    "resnet50": (16, 32),
}


def _flag(name: str, default: str) -> bool:
    return os.environ.get(name, default) not in ("", "0", "false")


def _mfu(gflops_per_unit, ms_per_unit, peak) -> float:
    return round((gflops_per_unit / ms_per_unit) / (peak / 1e12), 4)


def _infer_legs(entry, mt, peak, with_b8=True):
    built = _build_infer_model(mt, 512, 1, 21, 16)
    log(f"inference b1 {mt} ...")
    ms, sync_ms, gflops = bench_inference(mt, iters=50, built=built)
    entry.update({
        "infer_b1_ms": round(ms, 3),
        "infer_b1_sync_p50_ms": round(sync_ms, 3),
        "fwd_gflops": round(gflops, 2),
        "infer_b1_mfu": _mfu(gflops, ms, peak) if gflops else None,
    })
    base = BASELINE_INFER_MS.get(mt)
    if base:
        entry["baseline_ms_titanxp"] = base
        entry["speedup_vs_titanxp"] = round(base / ms, 2)
    log(f"  b1 {ms:.3f} ms ({entry.get('speedup_vs_titanxp', '-')}x)")

    if not with_b8:
        return
    log(f"inference b8 {mt} ...")
    ms8, _, gflops8 = bench_inference(mt, batch=8, iters=25, built=built)
    entry["infer_b8_ms_per_img"] = round(ms8, 3)
    entry["infer_b8_images_per_sec"] = round(1000.0 / ms8, 1)
    if gflops8:
        entry["infer_b8_mfu"] = _mfu(gflops8, ms8, peak)
    log(f"  b8 {ms8:.3f} ms/img")


def _train_point(mt, batch, peak, n_chips, **kw):
    ips, step_gflops = bench_train_throughput(mt, batch=batch, **kw)
    point = {"images_per_sec_per_chip": round(ips / n_chips, 2)}
    if step_gflops:
        point["mfu"] = _mfu(step_gflops / batch, 1000.0 / ips, peak)
    return ips, point


def _headline_family(configs, mt, train_batch, peak, n_chips):
    """Inference b1+b8 legs plus (if train_batch) the full jitted train
    step throughput + MFU for one model family."""
    e = configs.setdefault(mt, {})
    try:
        _infer_legs(e, mt, peak)
    except Exception as exc:
        log(f"  failed: {_exc_line(exc)}")
        e["infer_error"] = _exc_line(exc)
    if train_batch is None:
        return
    log(f"train {mt} b{train_batch} ...")
    try:
        ips, point = _train_point(mt, train_batch, peak, n_chips)
        e["train_batch"] = train_batch
        e["train_images_per_sec_per_chip"] = point["images_per_sec_per_chip"]
        if "mfu" in point:
            e["train_mfu"] = point["mfu"]
        base_ms = BASELINE_INFER_MS.get(mt)
        if base_ms:
            # ESTIMATED reference train throughput (it never published
            # one): train_ms ≈ 3x its published infer ms — keep labeled
            # ESTIMATED wherever this number is quoted (VERDICT r4 #8)
            est_ref_ips = 1000.0 / (3.0 * base_ms)
            e["est_tf_reference_train_ips"] = round(est_ref_ips, 2)
            e["train_speedup_vs_est_tf"] = round(ips / est_ref_ips, 1)
        e.setdefault("train_scaling", {})[f"b{train_batch}"] = point
        log(f"  {ips:.1f} img/s/chip (mfu {point.get('mfu')})")
    except Exception as exc:
        log(f"  failed: {_exc_line(exc)}")
        e["train_error"] = _exc_line(exc)


def _int8_leg(configs, mt, batch):
    log(f"int8 {mt} b{batch} ...")
    try:
        ms = bench_int8(mt, batch=batch)
        configs.setdefault(mt, {})[f"int8_b{batch}_ms_per_img"] = round(ms, 3)
        log(f"  {ms:.3f} ms/img")
    except Exception as exc:
        log(f"  failed: {_exc_line(exc)}")
        configs.setdefault(mt, {})[f"int8_b{batch}_error"] = _exc_line(exc)


def _transfer_bandwidth_gbps() -> float:
    """host->device transfer bandwidth of one training batch (8 x 512^2
    uint8 + labels ~= 8.4 MB): quantifies the tunnel residual that bounds
    cli_train on this rig (a real TPU host pays PCIe/DMA here)."""
    batch_bytes = 8 * 512 * 512 * 3 + 8 * 512 * 512
    host_buf = np.zeros(batch_bytes, np.uint8)
    jax.block_until_ready(jax.device_put(host_buf))  # warm path
    bw = []
    for i in range(3):
        host_buf[i] = i  # defeat any content caching
        t0 = time.perf_counter()
        dev = jax.device_put(host_buf)
        np.asarray(dev[-1])  # value fetch = real sync
        bw.append(batch_bytes / (time.perf_counter() - t0) / 1e9)
    return float(np.median(bw))


def main():
    # one-time-per-rig compiles (steady-state timings are unaffected —
    # the cached executable is bit-identical; only compile walls shrink)
    from deeplabv3p_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    # Whole-run budget (VERDICT r4 #1): r3 AND r4 both ended rc=124 with
    # parsed:null — the driver's own deadline (<38 min) killed the bench
    # and ignored the checkpoint tail. Only finishing with rc=0 counts.
    # 20 min undercuts every observed driver deadline; the per-section
    # budgeter below never starts a section whose cold-cache estimate
    # doesn't fit, so the run ENDS before the watchdog is ever needed.
    budget_min = float(os.environ.get(
        "DEEPLAB_BENCH_WATCHDOG_MIN", str(WATCHDOG_DEFAULT_MIN)
    ))
    _T0[0] = time.time()
    _DEADLINE[0] = _T0[0] + budget_min * 60
    watchdog = threading.Timer(budget_min * 60, _watchdog_fire)
    watchdog.daemon = True
    watchdog.start()

    devices = _init_devices_with_retry(
        max_wait_min=min(10.0, budget_min / 2)
    )
    n_chips = jax.device_count()
    peak = chip_peak_flops()
    log(f"devices: {devices}  peak_bf16={peak / 1e12:.0f} TFLOP/s")

    configs = _PARTIAL["configs"]
    _PARTIAL.update(
        peak=peak, n_chips=n_chips, device=str(devices[0])
    )
    with_remat = _flag("DEEPLAB_BENCH_REMAT", "1")
    with_fused = _flag("DEEPLAB_BENCH_FUSED", "1")

    # Cold-cache section cost estimates (minutes), sized from the round-4
    # driver run's section walls (BENCH_r04 tail reached remat/scaling
    # inside <38 min on a cold rig) with headroom. Sections run in
    # PRIORITY order; each gate compares its estimate to the remaining
    # budget and skips (recorded in sections_skipped) when it can't
    # finish — never start a section you can't finish.

    # ---- section 1: PRIMARY family — the metric line (ungated; still
    # registered so the adaptive scale sees its actual-vs-estimate) -----
    _note_section("headline:mobilenetv2_lite", 4.5)
    _headline_family(configs, "mobilenetv2_lite", 16, peak, n_chips)
    _checkpoint("headline:mobilenetv2_lite")

    # ---- section 2: int8 primary leg (promoted — VERDICT r4 #2: never
    # yet landed in a parsed driver record) ------------------------------
    if _budget_ok("int8:mobilenetv2_lite_b8", 2.5):
        _int8_leg(configs, "mobilenetv2_lite", 8)
        _checkpoint("int8:mobilenetv2_lite_b8")

    # ---- section 3: remaining train-bearing headline families ---------
    for mt, train_batch in (("xception", 8), ("resnet50", 8)):
        if not _budget_ok(f"headline:{mt}", 4.5):
            break
        _headline_family(configs, mt, train_batch, peak, n_chips)
        _checkpoint(f"headline:{mt}")

    # ---- section 4: cli_train end-to-end host pipeline (promoted —
    # VERDICT r4 #2; includes the device_cache path) ---------------------
    if _budget_ok("cli_train", 5.5):
        log("host->device transfer bandwidth ...")
        try:
            transfer_gbps = _transfer_bandwidth_gbps()
            log(f"  {transfer_gbps:.3f} GB/s")
        except Exception as exc:
            log(f"  failed: {_exc_line(exc)}")
            transfer_gbps = 0.0
        log("cli pipeline (on-disk JPEG -> fused train step) ...")
        try:
            _run_cli_pipeline(configs, transfer_gbps)
        except Exception as exc:
            log(f"  failed: {_exc_line(exc)}")
            configs["cli_train"] = {"error": _exc_line(exc)}
        _checkpoint("cli_train")

    # ---- section 5: remaining published-baseline rows (BASELINE.md
    # lists six reference latencies; headline covers three). b1-only:
    # that's the reference comparison point, and each b8 leg costs a
    # separate ~1.5-min program build/load through the tunnel (b8 values
    # for these families are pinned in BENCH_r02/ROUND4_NOTES) ----------
    for mt in ("mobilenetv2", "mobilenetv3large", "peleenet_lite",
               "mobilenetv3small_lite"):
        if not _budget_ok(f"baseline:{mt}", 2.0):
            break
        e = configs.setdefault(mt, {})
        try:
            _infer_legs(e, mt, peak, with_b8=False)
        except Exception as exc:
            log(f"  failed: {_exc_line(exc)}")
            e["infer_error"] = _exc_line(exc)
        _checkpoint(f"baseline:{mt}")

    # ---- section 6: cheap, high-information legs ------------------------
    if _budget_ok("eval_fused", 1.5):
        log("fused eval step throughput ...")
        try:
            eval_ips = bench_eval_throughput()
            configs["eval_fused"] = {
                "model": "mobilenetv2_lite", "batch": 8,
                "images_per_sec": round(eval_ips, 1),
                "note": "uint8->normalize->forward->argmax->one-hot-matmul "
                        "confusion in ONE XLA program",
            }
            log(f"  {eval_ips:.1f} img/s")
        except Exception as exc:
            log(f"  failed: {_exc_line(exc)}")
            configs["eval_fused"] = {"error": _exc_line(exc)}
        _checkpoint("eval_fused")

    if _budget_ok("crf_postprocess", 2.5):
        log("dense-CRF postprocess on device ...")
        try:
            crf_ms = bench_crf()
            configs["crf_postprocess"] = {
                "input": 512, "num_classes": 21, "n_iters": 5,
                "ms_per_image": round(crf_ms, 3),
                "note": "true-RGB bilateral grid (postprocess.py); the "
                        "reference runs CRF on the host CPU via pydensecrf "
                        "(postprocess_np.py:10-28, the pipeline's CPU hot "
                        "spot, typically O(1 s)/image at this size); no "
                        "in-env baseline is measurable (pydensecrf not "
                        "installable)",
            }
            log(f"  {crf_ms:.3f} ms/image")
        except Exception as exc:
            log(f"  failed: {_exc_line(exc)}")
            configs["crf_postprocess"] = {"error": _exc_line(exc)}
        _checkpoint("crf_postprocess")

    # host-CPU only; a cold rig pays a one-time binary build + onnx
    # export here (cached under ~/.cache afterwards)
    if _budget_ok("native_cli", 6.0):
        log("native C++ onnx engine invoke (512x512x21 fp32, 1 thread) ...")
        try:
            native_ms = bench_native_cli()
            configs["native_cli"] = {
                "model": "mobilenetv2_lite", "input": 512, "engine": "onnx",
                "threads": 1, "invoke_ms": round(native_ms, 1),
                "reference_tflite_ms_4thread": 428.07,
                "reference_mnn_ms_4thread": 111.68,
                "note": "pure-C++ opset-13 interpreter "
                        "(inference/onnx_engine.cc), zero Python/TF at "
                        "runtime; reference inference/README.md:137,301",
            }
            log(f"  {native_ms:.1f} ms/invoke")
        except Exception as exc:
            log(f"  failed: {_exc_line(exc)}")
            configs["native_cli"] = {"error": _exc_line(exc)}
        _checkpoint("native_cli")

    if _budget_ok("learn", 3.5):
        log("learning proof (overfit example/ pairs, score with eval) ...")
        try:
            miou, epochs, secs = bench_learn()
            configs["learn"] = {
                "model": "mobilenetv2", "input": 256, "epochs": epochs,
                "train_miou": round(miou, 4), "target": 0.95,
                "train_seconds": round(secs, 1),
                "reached_target": bool(miou >= 0.95),
            }
            log(f"  train mIOU {miou:.4f} after {epochs} epochs "
                f"({secs:.0f}s)")
        except Exception as exc:
            log(f"  failed: {_exc_line(exc)}")
            configs["learn"] = {"error": _exc_line(exc)}
        _checkpoint("learn")

    # ---- section 7: OS8 — the memory-hard config (SURVEY §7) ----------
    if _budget_ok("os8", 2.0):
        try:
            log("inference b1 xception OS8 ...")
            ms, _, gflops = bench_inference(
                "xception", iters=25, output_stride=8
            )
            configs.setdefault("xception", {}).update({
                "os8_infer_b1_ms": round(ms, 3),
                "os8_fwd_gflops": round(gflops, 2),
                "os8_infer_b1_mfu": _mfu(gflops, ms, peak) if gflops
                else None,
            })
            log(f"  {ms:.3f} ms")
        except Exception as exc:
            log(f"  failed: {_exc_line(exc)}")
            configs.setdefault("xception", {})["os8_infer_error"] = (
                _exc_line(exc)
            )
        _checkpoint("os8")

    # ---- section 8: MFU lever legs -------------------------------------
    # fused_loss on the two families where it matters (xception = the
    # measured WIN, mnv2-lite = the primary); remat demoted to ONE
    # documentation leg (measured negative three rounds running —
    # VERDICT r4 #2 prescribes demoting it)
    lever_legs = []
    if with_fused:
        lever_legs += [("fused_loss", "xception", 8, {"fused_loss": True}),
                       ("fused_loss", "mobilenetv2_lite", 16,
                        {"fused_loss": True})]
    if with_remat:
        lever_legs += [("remat_block", "xception", 8, {"remat": "block"})]
    for label, mt, train_batch, kw in lever_legs:
        if not _budget_ok(f"{label}:{mt}", 3.0):
            break
        e = configs.setdefault(mt, {})
        log(f"train {mt} b{train_batch} {label} ...")
        key = f"b{train_batch}_{label}"
        try:
            ips, point = _train_point(mt, train_batch, peak, n_chips, **kw)
            e.setdefault("train_scaling", {})[key] = point
            log(f"  {ips:.1f} img/s/chip (mfu {point.get('mfu')})")
        except Exception as exc:
            log(f"  failed: {_exc_line(exc)}")
            e.setdefault("train_scaling", {})[key] = {
                "error": _exc_line(exc)
            }
        _checkpoint(f"{label}:{mt}")

    # ---- section 9: batch-scaling study --------------------------------
    for mt, batches in SCALING.items():
        e = configs.setdefault(mt, {})
        scaling = e.setdefault("train_scaling", {})
        for batch in batches:
            if not _budget_ok(f"scaling:{mt}_b{batch}", 2.5):
                break
            log(f"train {mt} b{batch} ...")
            try:
                ips, point = _train_point(mt, batch, peak, n_chips)
                scaling[f"b{batch}"] = point
                log(f"  {ips:.1f} img/s/chip (mfu {point.get('mfu')})")
            except Exception as exc:
                log(f"  failed: {_exc_line(exc)}")
                scaling[f"b{batch}"] = {"error": _exc_line(exc)}
            _checkpoint(f"scaling:{mt}_b{batch}")

    # ---- section 10: remaining int8 legs -------------------------------
    for mt, batch in (("mobilenetv2_lite", 1), ("xception", 1),
                      ("xception", 8)):
        if not _budget_ok(f"int8:{mt}_b{batch}", 2.0):
            break
        _int8_leg(configs, mt, batch)
        _checkpoint(f"int8:{mt}_b{batch}")

    _emit()
    # exceptions/atexit teardown against a dead tunnel can hang the
    # interpreter for ~45 min while holding the single TPU client —
    # results are printed, leave immediately
    os._exit(0)


def _run_cli_pipeline(configs, transfer_gbps):
    (cli_ips, cli_ips_mean, decode_ips,
     packed_best, packed_mean, dev_best, dev_mean) = bench_cli_pipeline()
    configs["cli_train"] = {
        "images_per_sec": round(cli_ips, 1),
        "images_per_sec_mean": round(cli_ips_mean, 1),
        "packed_shards_images_per_sec": round(packed_best, 1),
        "packed_shards_images_per_sec_mean": round(packed_mean, 1),
        # --device_cache path: whole set resident in HBM, on-device
        # batch gather — no per-step decode OR transfer (device_cache.py)
        "device_cache_images_per_sec": round(dev_best, 1),
        "device_cache_images_per_sec_mean": round(dev_mean, 1),
        "host_decode_ceiling_images_per_sec": round(decode_ips, 1),
        "fraction_of_decode_ceiling": round(cli_ips / decode_ips, 3),
        "tunnel_transfer_gbps": round(transfer_gbps, 3),
        # ceiling implied by the tunnel alone: bytes/image at 512^2 uint8
        "tunnel_transfer_ceiling_images_per_sec": round(
            transfer_gbps * 1e9 / (512 * 512 * 4), 1
        ),
        # Bench-rig caveat: decode shares ONE bursty CPU core (identical
        # decode epochs measure 27..130 img/s back-to-back) and every
        # step's 8.4 MB uint8 batch rides the tunneled-TPU connection; on
        # a dedicated TPU host neither bound exists and the device step
        # (see train entries) is the limiter.
        "note": "rig-bound: 1 bursty shared CPU core + tunneled transfers",
    }
    log(f"  cli {cli_ips:.1f} img/s (decode ceiling {decode_ips:.1f})")


if __name__ == "__main__":
    try:
        main()
    except BaseException:
        import traceback

        traceback.print_exc(file=sys.stderr)
        log("bench aborted — emitting partial results")
        _emit(partial=True)
        os._exit(0)
