#!/usr/bin/env python3
"""A/B the bf16-optimizer-state lever on the HBM-bound mnv2-lite step.

VERDICT r4 #4: mnv2-lite's train step is HBM-bandwidth-bound (102% of
peak per XLA cost analysis, train_phase_profile round 4); SGD-momentum
state in fp32 is read+written every step, so storing it in bfloat16
halves that slice of the traffic. This script measures the same
bench train leg with state_dtype=None (fp32, default) vs "bfloat16"
and prints one JSON line with both, so the result can be pinned in
ROUND5_NOTES.md as a measured win or a documented negative.

Usage:  python tools/misc/optim_state_ab.py [--model mobilenetv2_lite]
            [--batch 32] [--iters 10] [--device cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="mobilenetv2_lite")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--input", type=int, default=512)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--device", default=None, help="'cpu' for smoke only")
    args = p.parse_args()

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import bench
    from deeplabv3p_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    out = {"model": args.model, "batch": args.batch}
    try:
        for label, dtype in (("fp32_state", None),
                             ("bf16_state", "bfloat16")):
            ips, gflops = bench.bench_train_throughput(
                args.model, hw=args.input, batch=args.batch,
                iters=args.iters, state_dtype=dtype,
            )
            out[label] = {"images_per_sec_per_chip": round(ips, 1),
                          "step_gflops": round(gflops, 2)}
            print(f"# {label}: {ips:.1f} img/s", file=sys.stderr)
        a = out["fp32_state"]["images_per_sec_per_chip"]
        b = out["bf16_state"]["images_per_sec_per_chip"]
        out["speedup_bf16_vs_fp32"] = round(b / a, 4)
        print(json.dumps(out))
    except Exception as exc:  # noqa: BLE001
        print(json.dumps({**out, "error": f"{type(exc).__name__}: {exc}"}))
        os._exit(1)
    os._exit(0)  # never hang the tunnel at interpreter exit (CLAUDE.md #2)


if __name__ == "__main__":
    main()
