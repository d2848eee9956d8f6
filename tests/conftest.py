"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; per SURVEY.md §4 we simulate
a mesh with XLA's host-platform device-count flag.

NOTE: this environment's sitecustomize registers an 'axon' TPU platform
and programmatically sets jax.config.jax_platforms — plain JAX_PLATFORMS
env overrides are ignored, so we must use jax.config.update AFTER import
but BEFORE any backend initialization. Running tests on the tunneled TPU
is both slow and single-client (concurrent test processes deadlock).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

assert jax.device_count() == 8, "tests require the virtual 8-device CPU mesh"
