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
