"""Test configuration: CPU backend, float64, 8 virtual devices.

Numerical-parity tests (golden-file replays pinned by the reference suite)
require float64, which TPUs only emulate — so tests run on the CPU backend,
like the reference CI (``/root/reference/tests/envs/test_core_functions.py:11-12``).
The 8 virtual CPU devices let the mesh-sharding tests exercise real
multi-device ``jax.sharding`` layouts without TPU hardware.
"""

import os

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
# Detach the axon relay and force the LOCAL CPU backend.  The axon
# sitecustomize imports jax at interpreter startup with JAX_PLATFORMS=axon, so
# the env vars alone are too late under pytest — the jax.config.update call is
# what actually selects the true local CPU client (see CLAUDE.md "TPU
# runtime" rules).  Note for bit-exactness tests: the XLA *CPU* backend
# contracts mul+add chains into FMAs context-dependently (LLVM), so two
# differently-structured programs computing the same math can differ by ~1
# ulp on CPU; the TPU compiler performs no such contraction.  CPU tests
# therefore pin tight closeness, and bitwise equivalence is asserted on
# TPU hardware by the benchmark harness.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound in-process compiled-program accumulation.

    The full suite compiles thousands of XLA:CPU executables; around test
    ~350 of a single-process run, XLA's CPU JIT segfaults inside
    ``backend_compile_and_load`` while compiling yet another program
    (reproduced 3/3 on this box, crash stack in the round-4 log: the
    stateful closed-loop VJP compile after ~5 GB of live executables).
    Every module passes in a fresh process, so the crash is accumulated
    compile-state, not any one program.  Dropping the jit caches after each
    module keeps the live-executable volume at single-module levels — the
    regime every module already proves stable — at the cost of
    recompilation for the handful of programs shared across modules.
    """
    yield
    jax.clear_caches()
