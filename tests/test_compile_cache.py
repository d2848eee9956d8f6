"""Persistent compilation cache (utils/compile_cache.py).

The cache turns this rig's dominant fixed cost (remote XLA compiles,
30 s - 20 min) into a one-time cost per program. These tests pin the
mechanics on the CPU backend: executables are serialized into the
configured directory and the env kill-switch works. (TPU-side
effectiveness depends on the PJRT backend supporting serialization —
JAX degrades gracefully when it doesn't.)
"""

import os

import jax
import jax.numpy as jnp
import pytest

from deeplabv3p_tpu.utils.compile_cache import (
    DISABLE_ENV,
    enable_compilation_cache,
)

pytestmark = pytest.mark.quick


def test_cache_populates_directory(tmp_path):
    d = enable_compilation_cache(str(tmp_path / "xla"),
                                 min_compile_secs=0.0)
    try:
        assert d is not None and os.path.isdir(d)

        @jax.jit
        def f(x):
            return jnp.tanh(x) @ x.T

        f(jnp.ones((32, 32))).block_until_ready()
        entries = os.listdir(d)
        assert entries, "no serialized executables written"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_env_kill_switch(tmp_path, monkeypatch):
    monkeypatch.setenv(DISABLE_ENV, "1")
    assert enable_compilation_cache(str(tmp_path / "xla")) is None
    # "0"/empty mean enabled
    monkeypatch.setenv(DISABLE_ENV, "0")
    try:
        assert enable_compilation_cache(str(tmp_path / "xla2")) is not None
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
