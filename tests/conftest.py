"""Test configuration: CPU backend, float64, 8 virtual devices.

Numerical-parity tests (golden-file replays pinned by the reference suite)
require float64, which TPUs only emulate — so tests run on the CPU backend,
like the reference CI (``/root/reference/tests/envs/test_core_functions.py:11-12``).
The 8 virtual CPU devices let the mesh-sharding tests exercise real
multi-device ``jax.sharding`` layouts without TPU hardware.
"""

import os

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
