"""Persistent XLA compilation cache for the CLIs and bench.

Big XLA compiles are the dominant fixed cost of every CLI invocation on
TPU (30-60 s for a 512px model; the 21-class fused Pallas loss tail
takes ~20 min through this rig's remote-compile helper). JAX's
persistent compilation cache serializes compiled executables keyed by
(program, compile options, jaxlib/backend version), so each program
compiles ONCE per machine instead of once per process.

The reference has no counterpart — Keras re-traces and re-compiles its
graph every process (reference train.py:98-105 rebuilds + compiles the
model per run); this is a TPU-workflow feature the rebuild adds.

Not every PJRT backend supports executable serialization (a backend
without it simply never populates the cache — JAX degrades gracefully
and logs a warning rather than failing), so enabling this is always
safe.

Measured on this rig (train.py, mnv2-lite 64px toy run, CPU): first run
pays the compile (steady epoch 79.9 s), the identical second process
loads the serialized executable (6.3 s) with bit-identical losses.
Caveat: XLA:CPU AOT loading warns when the compiling machine's CPU
features differ from the executing one (it proceeds; results verified
identical here) — a shared cache dir across heterogeneous hosts should
be avoided.
"""

import os

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/deeplabv3p_tpu/xla")
DISABLE_ENV = "DEEPLAB_NO_COMPILE_CACHE"


def enable_compilation_cache(cache_dir=None, min_compile_secs=1.0):
    """Turn on JAX's persistent compilation cache.

    Call before the first compile (idempotent; later calls just repoint
    the directory). Set the env var DEEPLAB_NO_COMPILE_CACHE=1 to opt
    out (e.g. when benchmarking cold-compile behavior itself).

    Args:
      cache_dir: directory for serialized executables (created if
        missing). Defaults to ~/.cache/deeplabv3p_tpu/xla.
      min_compile_secs: only cache programs whose compile took at least
        this long — tiny op-by-op dispatches aren't worth disk churn.

    Returns the cache directory, or None when disabled via env.
    """
    if os.environ.get(DISABLE_ENV, "").strip() not in ("", "0"):
        return None
    import jax

    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    # default threshold skips small executables; we want the cache keyed
    # purely on compile time (the tunnel makes even small compiles slow)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
