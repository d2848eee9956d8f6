"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; per SURVEY.md §4 we simulate
a mesh with XLA's host-platform device-count flag. This must be set before
JAX initializes its backends, hence at conftest import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
