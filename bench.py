"""Headline benchmark: pendulum env-steps/sec/chip at batch 65,536.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} where
``vs_baseline`` is measured against the BASELINE.json north star of
1e8 env-steps/sec/chip (the reference publishes no numbers of its own —
its hot loop is one Python-dispatched ``vmap_step`` per control step,
``/root/reference/README.md:28-31``).

Four measured paths — the exact ``vmap_rollout`` scan, the exact-op fused
Pallas kernel (must agree bit-for-bit with the scan), the fast-math Pallas
kernel (tolerance-gated), and the fast kernel's sustained long-horizon
throughput (T=16384 links) — timed as chains of sequentially dependent
rollouts ending in a device->host fence.  On this relayed TPU runtime that
is the only trustworthy methodology: ``block_until_ready`` can return before
execution completes, errors surface only at fetch, and identical
(executable, args) executions are served from a cache; the chained
data dependency plus the closing fetch defeat all three failure modes.

The reported ``value`` is the fastest path with *exact* step arithmetic
(scan, or a fused kernel that agrees bit-for-bit with the scan) — the
BASELINE.json budget demands trajectory error <=1e-6 vs the f64 reference,
which only the exact-op paths satisfy.  The fast-math paths (polynomial
sin, fast wrap; observed ~3e-3 rad over 24k steps) are reported as
secondary fields and never crowned.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

BATCH = 65536
STEPS = 4096  # long horizon amortizes the relay's per-execution overhead
NORTH_STAR = 1e8
ATOL_FAST = 1e-2  # max |delta theta| (rad) allowed between fast and exact paths


CHAIN = 6  # sequentially dependent rollouts per timing (amortizes the fence)


def _time_chained(roll_fn, warm_state, pass_states, action_sets, fence_leaf):
    """Best wall time of ``CHAIN`` sequentially dependent rollouts, fenced.

    Three properties make this unfakeable on the relayed runtime (where
    ``block_until_ready`` can return before execution completes and identical
    (executable, args) executions are served from a cache):

    * each rollout consumes the previous rollout's final state, so the chain
      cannot be reordered, deduplicated, or skipped,
    * the timed region ends with a device->host fetch of a reduced scalar,
      which can only complete after the whole chain has executed, and
    * warm-up runs from ``warm_state``, which no timed pass reuses, so not
      even the first link of a pass can be served from the cache.

    One pass per entry of ``pass_states`` (distinct states => distinct
    executions); the best pass is reported because the relay can route the
    early executions of a fresh executable to a slow worker pool (observed
    100-1000x). Returns ``(seconds_per_rollout_best, final_output)`` with
    the final output taken from the LAST pass (start all paths from the
    same last pass state to cross-validate their outputs).
    """
    out = roll_fn(warm_state, action_sets[0])  # compile + route
    jax.block_until_ready(out)
    best = float("inf")
    st = None
    for state0 in pass_states:
        t0 = time.perf_counter()
        st = state0
        for i in range(CHAIN):
            st = roll_fn(st, action_sets[i % len(action_sets)])
        fence = float(jnp.mean(fence_leaf(st)))  # hard fence
        elapsed = time.perf_counter() - t0
        if not jnp.isfinite(fence):
            raise RuntimeError(f"non-finite chained result: {fence}")
        best = min(best, elapsed)
    return best / CHAIN, st


def _finite(*vals):
    for v in vals:
        if not jnp.isfinite(v):
            raise RuntimeError(f"non-finite benchmark result: {vals}")


def run():
    import exciting_environments_tpu as excenvs
    from exciting_environments_tpu.ops.pallas.pendulum_fast import pendulum_fast_rollout

    env = excenvs.Pendulum(batch_size=BATCH, tau=1e-4)
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), BATCH))
    _, state_w = env.vmap_reset(jax.random.split(jax.random.PRNGKey(6), BATCH))  # warm-up only
    _, state_b = env.vmap_reset(jax.random.split(jax.random.PRNGKey(5), BATCH))
    # every path times passes [state_b, state] after warming on state_w; the
    # last (state) pass's output is what cross-path validation compares
    passes = [state_b, state]
    action_sets = [
        jax.random.uniform(jax.random.PRNGKey(10 + i), (BATCH, STEPS, 1), minval=-1.0, maxval=1.0)
        for i in range(4)
    ]
    jax.block_until_ready((state, action_sets))

    from exciting_environments_tpu.core import structures

    theta_leaf = lambda st: st.physical_state.theta

    # path 1: exact step semantics via the fused scan
    t_exact, last = _time_chained(
        lambda st, a: env.vmap_rollout(st, a, STEPS)[1], state_w, passes, action_sets, theta_leaf
    )
    theta_exact = last.physical_state.theta
    _finite(jnp.mean(theta_exact), jnp.mean(jnp.abs(last.physical_state.omega)))
    exact_value = BATCH * STEPS / t_exact

    value = exact_value
    path = "vmap_rollout_exact"
    fast_value = None
    max_dev = None

    on_tpu = jax.default_backend() != "cpu"
    fused_value = None
    fused_sustained_value = None
    fast_sustained_value = None
    fused_dev = None
    if on_tpu:
        # path 2: exact-op fused Pallas kernel; the whole chain must agree
        # with path 1 bit-for-bit (independent implementations, same inputs)
        from exciting_environments_tpu.ops.pallas.stepper import env_fused_rollout

        t_fused, last_fused = _time_chained(
            lambda st, a: env_fused_rollout(env, st, a)[1], state_w, passes, action_sets, theta_leaf
        )
        fused_dev = float(jnp.max(jnp.abs(last_fused.physical_state.theta - theta_exact)))
        fused_value = BATCH * STEPS / t_fused
        if fused_dev == 0.0 and fused_value > value:
            value = fused_value
            path = "pallas_fused_exact"

        # path 3: fast-math Pallas kernel, tolerance-gated against path 1.
        # NEVER the headline — its arithmetic (polynomial sin, fast wrap) does
        # not meet the <=1e-6 trajectory budget; reported for reference only.
        def fast_step(st, a):
            th, om = pendulum_fast_rollout(env, st, a)
            return structures.replace(
                st, physical_state=structures.replace(st.physical_state, theta=th, omega=om)
            )

        t_fast, last_fast = _time_chained(fast_step, state_w, passes, action_sets, theta_leaf)
        max_dev = float(
            jnp.max(jnp.abs(((last_fast.physical_state.theta - theta_exact) + jnp.pi) % (2 * jnp.pi) - jnp.pi))
        )
        fast_value = BATCH * STEPS / t_fast

        # path 4: sustained long-horizon throughput, time-major action slab
        # (the kernels stream actions time-major; this layout skips a 4.3 GB
        # transposed copy per link).  4a times the EXACT fused kernel — the
        # same arithmetic path 2 just proved bit-identical to the scan over
        # 24,576 chained steps, so it is headline-eligible.  4b times the
        # fast-math kernel (secondary field only).
        del action_sets, last, last_fused, last_fast  # free HBM for the slab
        t_long = 16384
        a_long = jax.random.uniform(
            jax.random.PRNGKey(99), (t_long, BATCH, 1), minval=-1.0, maxval=1.0
        )
        _, state_c = env.vmap_reset(jax.random.split(jax.random.PRNGKey(11), BATCH))
        sustained_passes = [state_c] + passes  # extra draw vs slow-worker routing

        if fused_dev == 0.0:
            fused_step_tm = jax.jit(lambda st, a: env_fused_rollout(env, st, a, time_major=True)[1])
            t_link, _ = _time_chained(
                fused_step_tm, state_w, sustained_passes, [a_long], theta_leaf
            )
            fused_sustained_value = BATCH * t_long / t_link
            if fused_sustained_value > value:
                value = fused_sustained_value
                path = "pallas_fused_exact_sustained"

        if max_dev < ATOL_FAST:

            @jax.jit
            def fast_step_tm(st, a):
                th, om = pendulum_fast_rollout(env, st, a, time_major=True)
                return structures.replace(
                    st, physical_state=structures.replace(st.physical_state, theta=th, omega=om)
                )

            t_link, _ = _time_chained(
                lambda st, a: fast_step_tm(st, a), state_w, sustained_passes, [a_long], theta_leaf
            )
            fast_sustained_value = BATCH * t_long / t_link

    # secondary figure: the flagship saturated-PMSM drive through its fused
    # kernel — bitwise-gated against the scan on-device, never the headline
    pmsm_fused_value = None
    pmsm_fused_dev = None
    if on_tpu:
        try:
            from exciting_environments_tpu.ops.pallas.pmsm_stepper import pmsm_fused_rollout

            penv = excenvs.PMSM(
                batch_size=BATCH, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA
            )
            _, pstate = penv.vmap_reset(jax.random.split(jax.random.PRNGKey(3), BATCH))
            _, pstate_b = penv.vmap_reset(jax.random.split(jax.random.PRNGKey(4), BATCH))
            p_steps = 256
            p_actions = [
                jax.random.uniform(
                    jax.random.PRNGKey(40 + i), (BATCH, p_steps, 2), minval=-0.3, maxval=0.3
                )
                for i in range(3)
            ]
            a_eq = p_actions[0][:, :64]
            _, p_ref = penv.vmap_rollout(pstate, a_eq, 64)
            _, p_fused = pmsm_fused_rollout(penv, pstate, a_eq)
            pmsm_fused_dev = max(
                float(
                    jnp.max(
                        jnp.abs(
                            jnp.asarray(getattr(p_ref.physical_state, n))
                            - jnp.asarray(getattr(p_fused.physical_state, n))
                        )
                    )
                )
                for n in ("i_d", "i_q", "epsilon", "torque", "u_d_buffer", "u_q_buffer")
            )
            # same chained-marginal methodology as every other path: each
            # link consumes the previous link's final state (cache-proof),
            # warm-up state never reused, hard fence on a reduced scalar.
            # (The former hand-rolled chain timed an eagerly-compiled input
            # multiply and warmed up behind the relay's lying
            # block_until_ready, under-reading ~4x.)
            _, pstate_w = penv.vmap_reset(jax.random.split(jax.random.PRNGKey(5), BATCH))
            t_link, _ = _time_chained(
                lambda st, a: pmsm_fused_rollout(penv, st, a)[1],
                pstate_w, [pstate_b, pstate], p_actions,
                lambda st: st.physical_state.i_d,
            )
            pmsm_fused_value = BATCH * p_steps / t_link
        except Exception:
            pass  # the secondary figure must never take down the headline

    # fast-mode stochastic parity GATE (round 5): the committed r4
    # characterization (26/65536 instances, 8.1e-2 max normalized dev at
    # T=64 — rare context-dependent lowering of the fast scan's constraint
    # dots, a third program structure) is pinned with ~3x headroom; a
    # regression that widens the third structure's divergence flips
    # ``pmsm_fast_mode_parity.ok`` to false in every bench record from now
    # on, so it cannot land silently.  Exact mode stays bitwise-gated via
    # ``pmsm_fused_vs_scan_max_abs_dev`` above.
    pmsm_fast_parity = None
    if on_tpu:
        try:
            from exciting_environments_tpu.ops.pallas.pmsm_stepper import pmsm_fused_rollout

            fenv = excenvs.PMSM(
                batch_size=BATCH, saturated=True,
                motor_variant=excenvs.MotorVariant.BRUSA,
                process_noise={"i_d": 0.5, "i_q": 0.5},
                observation_noise={"i_d": 0.5, "i_q": 0.5},
                noise_mode="fast",
            )
            _, fstate = fenv.vmap_reset(jax.random.split(jax.random.PRNGKey(7), BATCH))
            fa = jax.random.uniform(
                jax.random.PRNGKey(44), (BATCH, 64, 2), minval=-0.3, maxval=0.3
            )
            _, fl_s = fenv.vmap_rollout(fstate, fa, 64)
            _, fl_f = pmsm_fused_rollout(fenv, fstate, fa)
            fpn = fenv.env_properties.physical_normalizations
            norm_dev = lambda n: jnp.abs(
                jnp.asarray(getattr(fl_f.physical_state, n))
                - jnp.asarray(getattr(fl_s.physical_state, n))
            ) * (2.0 / float(getattr(fpn, n).max - getattr(fpn, n).min))
            per_inst = jnp.maximum(norm_dev("i_d"), norm_dev("i_q"))
            n_dev = int(jnp.sum(per_inst > 0))
            max_nd = float(jnp.max(per_inst))
            keys_eq = bool(
                jnp.array_equal(jnp.asarray(fl_f.PRNGKey), jnp.asarray(fl_s.PRNGKey))
            )
            pmsm_fast_parity = {
                "n_deviating": n_dev,
                "max_abs_norm_dev": max_nd,
                "final_keys_equal": keys_eq,
                "envelope_n": 100,
                "envelope_dev": 0.25,
                "ok": bool(n_dev <= 100 and max_nd <= 0.25 and keys_eq),
            }
        except Exception as e:  # visible, never fatal to the headline
            pmsm_fast_parity = {"ok": False, "error": str(e)[:200]}

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
                "fused_exact_sustained_value": fused_sustained_value,
                "fused_vs_scan_max_abs_dev": fused_dev,  # must be 0.0 (bit-exact)
                "fast_path_value": fast_value,
                "fast_sustained_value": fast_sustained_value,
                "fast_vs_exact_max_abs_dtheta_rad": max_dev,
                "pmsm_saturated_fused_value": pmsm_fused_value,
                "pmsm_fused_vs_scan_max_abs_dev": pmsm_fused_dev,  # 0.0 = bit-exact
                "pmsm_fast_mode_parity": pmsm_fast_parity,  # envelope gate (r5)
            }
        )
    )


def _supervise():
    """Run the measurement in a child process with a hard timeout.

    A downed relay does not raise — ``jax.devices()`` blocks indefinitely
    inside PJRT (observed during round 3), which no in-process retry or
    signal handler can interrupt.  The parent enforces a wall-clock budget
    per attempt and backs off ~6 min total across attempts."""
    import os
    import subprocess

    attempt_budget = float(os.environ.get("BENCH_ATTEMPT_TIMEOUT", "1200"))
    backoff_scale = float(os.environ.get("BENCH_BACKOFF_SCALE", "1"))
    last_err = "unknown"
    for sleep_s in (20, 40, 80, 160, 0):
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--child"],
                capture_output=True, text=True, timeout=attempt_budget,
            )
        except subprocess.TimeoutExpired:
            last_err = f"attempt timed out after {attempt_budget}s (relay down/hung?)"
        else:
            lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
            if proc.returncode == 0 and lines:
                print(lines[-1])
                return
            last_err = (proc.stderr or proc.stdout or "no output").strip()[-300:]
        time.sleep(sleep_s * backoff_scale)
    print(json.dumps({"metric": "bench_failed", "value": 0, "unit": "env-steps/s",
                      "vs_baseline": 0, "error": str(last_err)[:200]}))
    sys.exit(1)


if __name__ == "__main__":
    if "--child" in sys.argv:
        run()
    else:
        _supervise()
