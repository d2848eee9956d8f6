#!/usr/bin/env python3
"""Round-4 probe #2: does per-block remat UNLOCK larger batches for a
net throughput/MFU win? (VERDICT r3 #2.)

Probe #1 (round4_probe.py) measured remat as a throughput NEGATIVE at
fixed batch (xception b8: 129.9 img/s remat vs 153.6 fused / 154.8 r2
base) — expected, it trades recompute FLOPs for activation memory. Its
real value is the batches it makes fit: xception b32 OOM'd the 16 GB
v5e HBM in the round-3 driver run WITHOUT remat. This probe measures

  1. resnet50  b8            (missing base for probe-1's remat point)
  2. xception  b16           (scaling point)
  3. xception  b16 remat
  4. xception  b32 remat     (the r3 OOM config — does remat fit it?)
  5. resnet50  b32 remat
  6. xception  OS8 b1 infer  (pre-warms bench.py section 2's new leg)

One JSON line per completed leg; errors recorded per-leg; os._exit(0)
(CLAUDE.md rules 2/12).  Run: python tools/misc/round4_probe2.py
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

    import bench

    t0 = time.time()
    devices = bench._init_devices_with_retry(max_wait_min=40)
    emit({"leg": "canary", "devices": str(devices),
          "init_s": round(time.time() - t0, 1)})

    legs = [
        ("resnet50", 8, {}),
        ("xception", 16, {}),
        ("xception", 16, {"remat": "block"}),
        ("xception", 32, {"remat": "block"}),
        ("resnet50", 32, {"remat": "block"}),
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

    t0 = time.time()
    try:
        ms, sync_ms, gflops = bench.bench_inference(
            "xception", iters=25, output_stride=8
        )
        emit({"leg": "xception_os8_infer_b1",
              "wall_s": round(time.time() - t0, 1),
              "ms": round(ms, 3), "fwd_gflops": round(gflops, 1)})
    except Exception as exc:  # noqa: BLE001
        emit({"leg": "xception_os8_infer_b1",
              "wall_s": round(time.time() - t0, 1),
              "error": bench._exc_line(exc)})
    os._exit(0)


if __name__ == "__main__":
    main()
