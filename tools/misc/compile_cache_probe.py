"""Probe: does the persistent XLA compilation cache serialize executables
for THIS backend (axon TPU or CPU)?

Run twice in fresh processes:
    python tools/misc/compile_cache_probe.py --device tpu
The first run pays the compile; if the backend supports executable
serialization the second run's compile time collapses and the cache dir
gains a tpu-keyed entry. CLAUDE.md rule 14 left TPU-side support
unverified (CPU verified working); this probe settles it.

Exits via os._exit(0) always (tunnel rule: exceptions can hang teardown
for ~45 min while holding the single TPU client).
"""

import argparse
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from deeplabv3p_tpu.utils.compile_cache import (
        DEFAULT_CACHE_DIR, enable_compilation_cache,
    )

    # min_compile_secs=0: tiny probe programs compile in <1 s through the
    # tunnel's remote-compile helper, below the production threshold.
    cache_dir = enable_compilation_cache(min_compile_secs=0.0) or DEFAULT_CACHE_DIR
    before = set(os.listdir(cache_dir))

    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"# device: {dev}", flush=True)

    # distinctive program: odd shapes keyed to this probe so it cannot
    # collide with any model compile; big enough to clear the 1 s
    # min-compile-time threshold through the tunnel.
    @jax.jit
    def probe(x, w):
        for _ in range(6):
            x = jnp.tanh(x @ w) + x
        return x.sum()

    x = jnp.ones((131, 517), jnp.float32)
    w = jnp.ones((517, 517), jnp.float32)

    t0 = time.perf_counter()
    lowered = probe.lower(x, w)
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    val = float(compiled(x, w))
    print(f"# compile {compile_s:.2f} s   value {val:.3e}", flush=True)

    new = sorted(set(os.listdir(cache_dir)) - before)
    print(f"# new cache entries: {new}", flush=True)
    print(f"RESULT compile_s={compile_s:.2f} new_entries={len(new)}",
          flush=True)
    os._exit(0)


if __name__ == "__main__":
    try:
        main()
    except BaseException:
        import traceback

        traceback.print_exc()
        os._exit(1)
