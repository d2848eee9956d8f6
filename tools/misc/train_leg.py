#!/usr/bin/env python3
"""Time ONE bench train leg and print a JSON line — the minimal unit
for environment-level A/B experiments (e.g. XLA_FLAGS levers, VERDICT
r4 #4): run this twice under different env and compare.

Usage:  [XLA_FLAGS=...] python tools/misc/train_leg.py \
            --model xception --batch 8 [--input 512] [--iters 10]
            [--no_compile_cache] [--device cpu]

--no_compile_cache matters for flag experiments: a cached executable
was compiled under the OLD flags, so A/B runs must both compile fresh.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="xception")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--input", type=int, default=512)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--no_compile_cache", action="store_true")
    p.add_argument("--device", default=None, help="'cpu' for smoke only")
    p.add_argument(
        "--compiler_option", action="append", default=[],
        metavar="KEY=VALUE",
        help="XLA backend flag (repeatable), e.g. "
             "xla_tpu_enable_latency_hiding_scheduler=true. Rides the "
             "compile request as env_option_overrides — the only channel "
             "that reaches the REMOTE TPU compiler (client-side XLA_FLAGS "
             "is parsed by the local CPU XLA build, which fatally rejects "
             "TPU-only flags).")
    args = p.parse_args()

    if args.no_compile_cache:
        os.environ["DEEPLAB_NO_COMPILE_CACHE"] = "1"
    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import bench
    from deeplabv3p_tpu.utils.compile_cache import enable_compilation_cache

    if not args.no_compile_cache:
        enable_compilation_cache()

    copts = {}
    for kv in args.compiler_option:
        key, _, val = kv.partition("=")
        low = val.lower()
        copts[key] = (True if low == "true" else
                      False if low == "false" else
                      int(val) if val.lstrip("-").isdigit() else val)

    out = {"model": args.model, "batch": args.batch,
           "input": args.input,
           "compiler_options": copts or None,
           "xla_flags": os.environ.get("XLA_FLAGS", "")}
    try:
        ips, gflops = bench.bench_train_throughput(
            args.model, hw=args.input, batch=args.batch, iters=args.iters,
            compiler_options=copts or None,
        )
        out.update(images_per_sec_per_chip=round(ips, 1),
                   step_gflops=round(gflops, 2))
        print(json.dumps(out))
    except Exception as exc:  # noqa: BLE001
        print(json.dumps({**out, "error": f"{type(exc).__name__}: {exc}"}))
        sys.stdout.flush()
        os._exit(1)
    sys.stdout.flush()
    os._exit(0)  # never hang the tunnel at interpreter exit (CLAUDE.md #2)


if __name__ == "__main__":
    main()
