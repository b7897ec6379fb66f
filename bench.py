"""Headline benchmark: pendulum env-steps/sec/chip at batch 65,536.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} where
``vs_baseline`` is measured against the BASELINE.json north star of
1e8 env-steps/sec/chip (the reference publishes no numbers of its own —
its hot loop is one Python-dispatched ``vmap_step`` per control step,
``/root/reference/README.md:28-31``).

Two measured paths, both with mandatory device->host validation (on this
TPU runtime execution failures surface only at fetch, so a timing without a
readback is meaningless):

1. ``vmap_rollout`` — exact step semantics (bit-identical to stepping
   ``vmap_step`` in a loop), full env pipeline fused into one on-chip scan.
2. the fast-math Pallas kernel (``ops/pallas/pendulum_fast``) — same Euler
   discretization with FMA-only sin/wrap; deviation from path (1) is
   measured every run and must stay below ATOL_FAST.

The reported value is the faster validated path; both numbers and the
measured deviation are included in the JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

BATCH = 65536
STEPS = 1024
NORTH_STAR = 1e8
ATOL_FAST = 1e-2  # max |delta theta| (rad) allowed between fast and exact paths


def _time_best(fn, inputs):
    """Best wall time of ``fn`` over distinct inputs.

    Each repeat uses a different input array: the relayed TPU runtime caches
    identical (executable, arguments) executions, so re-timing the same call
    measures the cache, not the chip.
    """
    out = fn(inputs[0])  # compile
    jax.block_until_ready(out)
    best = float("inf")
    for x in inputs[1:]:
        t0 = time.perf_counter()
        out = fn(x)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def _finite(*vals):
    for v in vals:
        if not jnp.isfinite(v):
            raise RuntimeError(f"non-finite benchmark result: {vals}")


def run():
    import exciting_environments_tpu as excenvs
    from exciting_environments_tpu.ops.pallas.pendulum_fast import pendulum_fast_rollout

    env = excenvs.Pendulum(batch_size=BATCH, tau=1e-4)
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), BATCH))
    action_sets = [
        jax.random.uniform(jax.random.PRNGKey(10 + i), (BATCH, STEPS, 1), minval=-1.0, maxval=1.0)
        for i in range(4)
    ]
    jax.block_until_ready((state, action_sets))

    # path 1: exact step semantics via the fused scan
    t_exact, (_, last) = _time_best(lambda a: env.vmap_rollout(state, a, STEPS), action_sets)
    theta_exact = last.physical_state.theta
    _finite(jnp.mean(theta_exact), jnp.mean(jnp.abs(last.physical_state.omega)))
    exact_value = BATCH * STEPS / t_exact

    value = exact_value
    path = "vmap_rollout_exact"
    fast_value = None
    max_dev = None

    on_tpu = jax.default_backend() != "cpu"
    fused_value = None
    if on_tpu:
        # path 2: exact-op fused Pallas kernel, must agree with path 1 exactly
        from exciting_environments_tpu.ops.pallas.stepper import env_fused_rollout

        t_fused, (_, last_fused) = _time_best(lambda a: env_fused_rollout(env, state, a), action_sets)
        theta_fused = last_fused.physical_state.theta
        _finite(jnp.mean(theta_fused))
        fused_dev = float(jnp.max(jnp.abs(theta_fused - theta_exact)))
        fused_value = BATCH * STEPS / t_fused
        if fused_dev == 0.0 and fused_value > value:
            value = fused_value
            path = "pallas_fused_exact"

        # path 3: fast-math Pallas kernel, cross-validated against path 1 on
        # the same final action set (two independent implementations agreeing
        # is the correctness check)
        t_fast, (th, om) = _time_best(lambda a: pendulum_fast_rollout(env, state, a), action_sets)
        _finite(jnp.mean(th), jnp.mean(jnp.abs(om)))
        max_dev = float(jnp.max(jnp.abs(((th - theta_exact) + jnp.pi) % (2 * jnp.pi) - jnp.pi)))
        fast_value = BATCH * STEPS / t_fast
        if max_dev < ATOL_FAST and fast_value > value:
            value = fast_value
            path = "pallas_fast_math"

    print(
        json.dumps(
            {
                "metric": "pendulum_env_steps_per_sec_per_chip_batch65536",
                "value": value,
                "unit": "env-steps/s",
                "vs_baseline": value / NORTH_STAR,
                "path": path,
                "exact_path_value": exact_value,
                "fused_exact_path_value": fused_value,
                "fast_path_value": fast_value,
                "fast_vs_exact_max_abs_dtheta_rad": max_dev,
            }
        )
    )


if __name__ == "__main__":
    last_err = None
    for attempt in range(3):
        try:
            run()
            break
        except Exception as e:  # flaky TPU tunnel: retry in-process
            last_err = e
            time.sleep(20)
    else:
        print(json.dumps({"metric": "bench_failed", "value": 0, "unit": "env-steps/s",
                          "vs_baseline": 0, "error": str(last_err)[:200]}))
        sys.exit(1)
