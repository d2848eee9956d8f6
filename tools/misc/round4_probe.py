#!/usr/bin/env python3
"""Round-4 on-rig probe: compile-affordability of the two dormant MFU
levers (VERDICT r3 #2/#3) plus cache pre-warm for the driver bench.

Measures, per leg, the TOTAL wall time of bench_train_throughput (which
is dominated by the jit compile on first run — exactly the cost the
driver bench would pay) and the honest steady-state throughput:

  1. mnv2-lite b16 unfused        (baseline compile + cache warm)
  2. mnv2-lite b16 fused_loss     (fori_loop Pallas kernel — was ~20 min
                                   as a 21-class unroll; goal <=3 min)
  3. mnv2-lite b16 remat=block    (per-block jax.checkpoint — whole-
                                   backbone remat never finished
                                   compiling on this rig, rule 12)
  4. xception  b8  remat=block
  5. xception  b8  fused_loss
  6. resnet50  b8  remat=block

One JSON line per completed leg (stdout, flushed) so a wedged tunnel
still leaves every finished measurement on disk. Never killed from
outside: on an exception the leg is recorded and the probe continues;
os._exit(0) at the end (CLAUDE.md rule 2).

Run: timeout-free, single TPU client:  python tools/misc/round4_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def emit(obj):
    print(json.dumps(obj), flush=True)


def main():
    from deeplabv3p_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    import bench

    t0 = time.time()
    devices = bench._init_devices_with_retry(max_wait_min=40)
    emit({"leg": "canary", "devices": str(devices),
          "init_s": round(time.time() - t0, 1)})

    legs = [
        ("mobilenetv2_lite", 16, {}),
        ("mobilenetv2_lite", 16, {"fused_loss": True}),
        ("mobilenetv2_lite", 16, {"remat": "block"}),
        ("xception", 8, {"remat": "block"}),
        ("xception", 8, {"fused_loss": True}),
        ("resnet50", 8, {"remat": "block"}),
    ]
    for mt, batch, kw in legs:
        label = f"{mt}_b{batch}" + "".join(
            f"_{k}={v}" for k, v in kw.items()
        )
        t0 = time.time()
        try:
            ips, gflops = bench.bench_train_throughput(
                mt, batch=batch, iters=10, **kw
            )
            emit({"leg": label, "wall_s": round(time.time() - t0, 1),
                  "img_per_s": round(ips, 1),
                  "step_gflops": round(gflops, 1)})
        except Exception as exc:  # noqa: BLE001 — record and continue
            emit({"leg": label, "wall_s": round(time.time() - t0, 1),
                  "error": bench._exc_line(exc)})
    os._exit(0)


if __name__ == "__main__":
    main()
