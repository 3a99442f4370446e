"""Test env: CPU backend with 8 virtual devices so sharding tests run
without TPU hardware (SURVEY.md §4 distributed-test strategy).

The sandbox's sitecustomize (PYTHONPATH=/root/.axon_site) force-registers
the tunneled single TPU ('axon') and overrides JAX_PLATFORMS, so the env
var alone is not enough — we must also update jax.config before any
backend initializes.  Tests must be deterministic and parallel-safe on
CPU; the real chip is reserved for bench.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# --- smoke tier (VERDICT r4 #10) -------------------------------------------
# `pytest -m smoke` = a <60 s cross-section: every fully-fast file plus
# one representative end-to-end test per subsystem (golden render, Pallas
# traversal parity, oracle parity, server session, checkpoint resume).
# Durations measured on the CPU suite (r5); keep additions fast.
import pytest  # noqa: E402

_SMOKE_FILES = {
    "test_camera.py", "test_core_ops.py", "test_parser.py",
    "test_protocol.py", "test_tangents.py", "test_image_io.py",
    "test_texture_hdri.py", "test_native.py",
}
_SMOKE_TESTS = {
    ("test_golden.py", "test_golden[cornell_16x16_native]"),
    ("test_golden.py", "test_golden[cornell_16x16_compat]"),
    ("test_pallas.py", "test_pallas_matches_per_ray"),
    ("test_oracle.py", "test_wavefront_matches_scalar_oracle"),
    ("test_server.py", "test_full_session"),
    ("test_checkpoint.py", "test_checkpoint_resume_exact"),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = item.nodeid.split("::")[0].rsplit("/", 1)[-1]
        tname = item.nodeid.split("::", 1)[-1]
        if fname in _SMOKE_FILES or (fname, tname) in _SMOKE_TESTS:
            item.add_marker(pytest.mark.smoke)
