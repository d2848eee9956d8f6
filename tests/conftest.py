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
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

assert jax.device_count() == 8, "tests require the virtual 8-device CPU mesh"


# ---------------------------------------------------------------------------
# quick/slow/tf markers (VERDICT r2 weak #9: the full suite takes ~47 min
# on this 1-core box; `pytest -m quick` is the sub-10-min iteration loop).
# Classification is by module, from measured --durations of the full run;
# individual tests can still mark themselves @pytest.mark.slow/tf.
# ---------------------------------------------------------------------------

# modules that import real TensorFlow/Keras (TF import alone ~40 s; the
# twin-building oracles dominate the suite wall-clock)
TF_MODULES = {
    "test_tf_parity",
    "test_tf_export",
}
# non-TF modules whose tests are dominated by heavy XLA compiles / CLI
# subprocesses / Pallas interpreter runs (measured --durations, r3)
SLOW_MODULES = {
    "test_train_e2e",
    "test_onnx_export",
    "test_onnx_registry",
    "test_learning",
    "test_native_cli",
    "test_pallas_aspp",
    "test_pallas_decoder",
    "test_pallas_mbconv",
    "test_parallel",
    "test_golden",
    "test_h5_roundtrip_registry",
    "test_inference_eval",
    "test_quantize",
    "test_validator",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        module = item.module.__name__.rsplit(".", 1)[-1]
        if module in TF_MODULES:
            item.add_marker(pytest.mark.tf)
            item.add_marker(pytest.mark.slow)
        elif module in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
        if not any(m.name in ("slow", "tf") for m in item.iter_markers()):
            item.add_marker(pytest.mark.quick)
