"""Benchmark suite reproducing the BASELINE.md measurement configs.

Prints one JSON line per config:
  {"metric": ..., "value": ..., "unit": "env-steps/s", ...}

Configs (BASELINE.json):
  1. Pendulum, batch=5, Euler, tau=2e-2, 1000-step torque sweep (README loop)
     -- measured both as the reference-style Python step loop (dispatch
     bound) and as the fused vmap_rollout.
  2. Mass-spring-damper, batch=16384, Euler (pure stepper throughput).
  3. CartPole + Acrobot, Tsit5 via vmap_sim_ahead.
  4. FluidTank, batch=65536, long-horizon sim_ahead.
  5. PMSM (linear + saturated BRUSA LUT), batch=65536, vmap_rollout;
     mesh-sharded when multiple devices are visible.

Every timed result is validated by a host readback of a reduced scalar
(guards against asynchronous backend failures).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# allow running as `python benchmarks/run_benchmarks.py` from a source checkout
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _validate_finite(tree, name):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    m = float(jnp.mean(jnp.asarray(leaf)))
    if not jnp.isfinite(m):
        raise RuntimeError(f"{name}: non-finite result (mean={m})")


def timed(name, fn, n_env_steps, inputs=None, repeats=3, validate=None):
    """Time ``fn`` with distinct inputs per repeat.

    The relayed TPU runtime caches identical (executable, args) executions,
    so repeats must vary their input; ``inputs`` is a list whose first entry
    warms up compilation and the rest are timed.  Without ``inputs`` the
    function is assumed to take no arguments (single-shot timing only).
    """
    if inputs is None:
        inputs = [None] * (repeats + 1)
        call = lambda x: fn()
    else:
        call = fn
    out = call(inputs[0])
    jax.block_until_ready(out)
    _validate_finite(validate if validate is not None else out, name)
    best = float("inf")
    for x in inputs[1:]:
        t0 = time.perf_counter()
        out = call(x)
        # hard fence: a device->host readback of a reduced scalar is the only
        # reliable completion barrier on the relayed runtime
        # (block_until_ready can return early); its latency is included, so
        # these figures are conservative lower bounds.
        leaf = jax.tree_util.tree_leaves(out)[0]
        if not jnp.isfinite(float(jnp.mean(jnp.asarray(leaf)))):
            raise RuntimeError(f"{name}: non-finite timed result")
        best = min(best, time.perf_counter() - t0)
    print(
        json.dumps(
            {
                "metric": name,
                "value": n_env_steps / best,
                "unit": "env-steps/s",
                "seconds": best,
            }
        ),
        flush=True,
    )
    return n_env_steps / best


def timed_chain(name, step_fn, state0, action_sets, n_per_link, k_chain=4):
    """Chained, marginal-cost timing (jitted whole-chain variant).

    ROUND-4 CAVEAT: jitting the whole K-link chain as ONE executable is
    untrustworthy at long horizons — the relay's completion signal can
    return early for large fused programs, inflating the marginal ~1.5x
    (measured against bench.py's eager chain, which reproduces its prior
    sustained headline to 2%).  New measurements should use the EAGER
    recipe of ``benchmarks/r04/rescale_rows_device.py`` (separate relay
    executions threading state, conservative whole-chain/K, affine-fit
    scaling gate); this function is kept for the short-horizon configs
    whose r3 rows it produced.

    Single-shot timings here carry ~35-40 ms of relay round-trip latency, and
    the relay's device->host fetch has been observed to return BEFORE
    execution completes for some programs (reporting "throughput" above the
    HBM bandwidth bound).  Chaining K sequentially *data-dependent* links of
    ``step_fn(state, actions_k) -> state`` inside one jitted program defeats
    both: elision is impossible (each link consumes the previous state) and
    the marginal cost ``(t_K - t_1) / (K - 1)`` cancels the constant latency.
    Inputs are perturbed per repeat (the relay caches identical
    (executable, args) executions).

    Reports ``value`` = sustained marginal throughput plus the conservative
    single-shot figure (latency included).
    """

    def make(K):
        @jax.jit
        def chain(state, acts):
            for k in range(K):
                state = step_fn(state, acts[k])
            return state

        return chain

    acts = jnp.stack(action_sets[:k_chain])

    def run(chain, a):
        out = chain(state0, a)
        jax.block_until_ready(out)
        best = float("inf")
        for rep in (1, 2):
            scaled = a * (1.0 + 1e-3 * rep)
            t0 = time.perf_counter()
            out = chain(state0, scaled)
            leaf = jax.tree_util.tree_leaves(out)[0]
            if not jnp.isfinite(float(jnp.mean(jnp.asarray(leaf)))):
                raise RuntimeError(f"{name}: non-finite chained result")
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = run(make(1), acts[:1])
    t_k = run(make(k_chain), acts)
    marginal = (t_k - t1) / (k_chain - 1)
    # Scaling gate (round-3): if the K-link chain costs barely more than one
    # link, the relay's completion signal is suspect for this program (fetch
    # returned early, or everything sat under the latency floor) — the
    # marginal is then NOISE and can overstate throughput by 10x+ (the round-2
    # cartpole fused sim-ahead read 2.5e10 this way while acrobot, whose
    # chain DID scale, read 1.6e9).  Fall back to the conservative
    # whole-chain average and say so in the artifact.
    scaling_ok = (t_k - t1) > 0.3 * t1
    if marginal > 0 and scaling_ok:
        value = n_per_link / marginal
    else:
        value = n_per_link * k_chain / t_k
    print(
        json.dumps(
            {
                "metric": name,
                "value": value,
                "unit": "env-steps/s",
                "methodology": "chained_marginal" if scaling_ok else "whole_chain_average",
                "chain_scaling_ok": scaling_ok,
                "seconds_single": t1,
                "seconds_chain": t_k,
                "k_chain": k_chain,
                "single_shot_value": n_per_link / t1,
            }
        ),
        flush=True,
    )
    return value


def bench_pendulum_readme_loop():
    import exciting_environments_tpu as excenvs

    env = excenvs.Pendulum(batch_size=5, tau=2e-2)
    _, state0 = env.vmap_reset()
    action = 0.3 * jnp.ones((5, 1))

    def loop():
        state = state0
        obs = None
        for _ in range(1000):
            obs, state = env.vmap_step(state, action)
        return obs

    timed("pendulum_b5_readme_python_loop_1000steps", loop, 5 * 1000, repeats=1)

    actions = jnp.broadcast_to(action[:, None, :], (5, 1000, 1))
    timed(
        "pendulum_b5_vmap_rollout_1000steps",
        lambda: env.vmap_rollout(state0, actions, 1000)[1],
        5 * 1000,
    )


def bench_msd_stepper():
    import exciting_environments_tpu as excenvs
    from exciting_environments_tpu.ops.pallas.stepper import env_fused_rollout, supports_fused_rollout

    B, T = 16384, 1024
    env = excenvs.MassSpringDamper(batch_size=B)
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B))
    action_sets = [
        jax.random.uniform(jax.random.PRNGKey(10 + i), (B, T, 1), minval=-1, maxval=1)
        for i in range(4)
    ]
    timed_chain(
        "msd_b16384_vmap_rollout",
        lambda st, a: env.vmap_rollout(st, a, T)[1],
        state,
        action_sets,
        B * T,
    )
    if supports_fused_rollout(env) and jax.default_backend() != "cpu":
        timed_chain(
            "msd_b16384_pallas_fused",
            lambda st, a: env_fused_rollout(env, st, a)[1],
            state,
            action_sets,
            B * T,
        )


def bench_tsit5_sim_ahead():
    import exciting_environments_tpu as excenvs

    for cls, name in [(excenvs.CartPole, "cartpole"), (excenvs.Acrobot, "acrobot")]:
        B, T = 4096, 256
        env = cls(batch_size=B, solver="tsit5")
        _, state = env.vmap_reset()
        action_sets = [
            jax.random.uniform(jax.random.PRNGKey(20 + i), (B, T, env.action_dim), minval=-0.5, maxval=0.5)
            for i in range(4)
        ]
        timed_chain(
            f"{name}_b4096_tsit5_sim_ahead",
            lambda st, a, env=env: env.vmap_sim_ahead(st, a, env.tau, env.tau)[2],
            state,
            action_sets,
            B * T,
        )

    if jax.default_backend() == "cpu":
        return
    from exciting_environments_tpu.ops.pallas.stepper import env_fused_sim_ahead

    for cls, name in [(excenvs.CartPole, "cartpole"), (excenvs.Acrobot, "acrobot")]:
        B, T = 65536, 256
        env = cls(batch_size=B, solver="tsit5")
        _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(1), B))
        # 8 action sets for a K=8 chain: long enough that per-link time
        # dominates the relay latency even for the fast cartpole kernel
        # (round-2's K=4 chain sat at the latency floor and its marginal
        # overstated the kernel 10x; see timed_chain's scaling gate)
        action_sets = [
            jax.random.uniform(jax.random.PRNGKey(20 + i), (B, T, env.action_dim), minval=-0.5, maxval=0.5)
            for i in range(8)
        ]
        # agreement gate vs the scan path (divisions in the mechanics RHS
        # round differently between the XLA and Mosaic lowerings, ~1 ulp/step
        # -> <= 1e-5 absolute over 32 steps; see ops/pallas/stepper.py)
        te = 32
        a_small = action_sets[0][:, :te]
        obs_r, _, last_r = env.vmap_sim_ahead(state, a_small, env.tau, env.tau)
        obs_f, last_f = env_fused_sim_ahead(env, state, a_small, env.tau, env.tau)
        max_dev = max(
            float(jnp.max(jnp.abs(jnp.asarray(getattr(last_r.physical_state, n)) - jnp.asarray(getattr(last_f.physical_state, n)))))
            for n in env._ode_state_fields
        )
        if max_dev > 1e-3:
            raise RuntimeError(f"fused tsit5 sim_ahead deviates from scan path: {max_dev}")
        print(
            json.dumps(
                {
                    "metric": f"{name}_b{B}_tsit5_fused_agreement",
                    "value": max_dev,
                    "unit": "max_abs_state_dev_vs_scan_32steps",
                }
            ),
            flush=True,
        )
        timed_chain(
            f"{name}_b{B}_tsit5_pallas_fused_sim_ahead",
            lambda st, a, env=env: env_fused_sim_ahead(
                env, st, a, env.tau, env.tau, obs_stride=T
            )[1],
            state,
            action_sets,
            B * T,
            k_chain=8,
        )


def bench_fluid_tank_long_horizon():
    import exciting_environments_tpu as excenvs

    B, T = 65536, 2048
    env = excenvs.FluidTank(batch_size=B)
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(2), B))
    action_sets = [
        jax.random.uniform(jax.random.PRNGKey(30 + i), (B, T, 1), minval=0.3, maxval=1.0)
        for i in range(4)
    ]
    timed_chain(
        "fluid_tank_b65536_rollout_2048steps",
        lambda st, a: env.vmap_rollout(st, a, T)[1],
        state,
        action_sets,
        B * T,
        k_chain=3,
    )


def bench_pmsm(batch=65536, steps=512):
    import exciting_environments_tpu as excenvs

    for saturated, variant, name in [
        (False, excenvs.MotorVariant.DEFAULT, "pmsm_linear"),
        (True, excenvs.MotorVariant.BRUSA, "pmsm_saturated_brusa"),
    ]:
        env = excenvs.PMSM(batch_size=batch, saturated=saturated, motor_variant=variant)
        _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(3), batch))
        action_sets = [
            jax.random.uniform(jax.random.PRNGKey(40 + i), (batch, steps, 2), minval=-0.3, maxval=0.3)
            for i in range(4)
        ]
        timed_chain(
            f"{name}_b{batch}_rollout_{steps}steps",
            lambda st, a, env=env: env.vmap_rollout(st, a, steps)[1],
            state,
            action_sets,
            batch * steps,
            k_chain=2 if saturated else 4,  # the saturated scan is slow
        )
        from exciting_environments_tpu.ops.pmsm_fast import pmsm_fast_rollout

        timed_chain(
            f"{name}_b{batch}_fast_math_{steps}steps",
            lambda st, a, env=env: pmsm_fast_rollout(env, st, a),
            state,
            action_sets,
            batch * steps,
        )

        if jax.default_backend() != "cpu":
            from exciting_environments_tpu.ops.pallas.pmsm_stepper import pmsm_fused_rollout

            # exactness gate vs the scan path on-device (saturated: bit-exact;
            # linear: <= 2 ulp/step division rounding, see pmsm_stepper.py)
            te = 64
            a_small = action_sets[0][:, :te]
            _, last_ref = env.vmap_rollout(state, a_small, te)
            _, last_fused = pmsm_fused_rollout(env, state, a_small)
            def rel_dev(n):
                a = jnp.asarray(getattr(last_ref.physical_state, n))
                b = jnp.asarray(getattr(last_fused.physical_state, n))
                scale = jnp.maximum(jnp.max(jnp.abs(a)), 1.0)
                return float(jnp.max(jnp.abs(a - b)) / scale)

            max_dev = max(
                rel_dev(n)
                for n in ("i_d", "i_q", "epsilon", "torque", "u_d_buffer", "u_q_buffer")
            )
            if saturated and max_dev != 0.0:
                raise RuntimeError(
                    f"saturated fused PMSM kernel deviates from scan path: {max_dev}"
                )
            # linear: <= 2 ulp/step division-lowering drift (pmsm_stepper.py)
            if max_dev > 1e-3:
                raise RuntimeError(f"fused PMSM kernel deviates from scan path: {max_dev}")
            print(
                json.dumps(
                    {
                        "metric": f"{name}_b{batch}_pmsm_fused_bitexact",
                        "value": max_dev,
                        "unit": "max_rel_state_dev_vs_scan_64steps",
                        "bitexact": max_dev == 0.0,
                    }
                ),
                flush=True,
            )
            timed_chain(
                f"{name}_b{batch}_pallas_fused_{steps}steps",
                lambda st, a, env=env: pmsm_fused_rollout(env, st, a)[1],
                state,
                action_sets,
                batch * steps,
            )
            timed_chain(
                f"{name}_b{batch}_pallas_fused_sim_ahead_{steps}steps",
                lambda st, a, env=env: env.fused_sim_ahead(st, a, env.tau, env.tau, obs_stride=steps)[1],
                state,
                action_sets,
                batch * steps,
            )


def bench_pendulum_headline(batch=65536, steps=1024):
    import exciting_environments_tpu as excenvs
    from exciting_environments_tpu.ops.pallas.stepper import env_fused_rollout

    env = excenvs.Pendulum(batch_size=batch, tau=1e-4)
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), batch))
    action_sets = [
        jax.random.uniform(jax.random.PRNGKey(50 + i), (batch, steps, 1), minval=-1, maxval=1)
        for i in range(4)
    ]
    timed_chain(
        "pendulum_b65536_vmap_rollout",
        lambda st, a: env.vmap_rollout(st, a, steps)[1],
        state,
        action_sets,
        batch * steps,
    )
    if jax.default_backend() != "cpu":  # compiled Pallas needs real TPU
        timed_chain(
            "pendulum_b65536_pallas_fused",
            lambda st, a: env_fused_rollout(env, st, a)[1],
            state,
            action_sets,
            batch * steps,
        )
        from exciting_environments_tpu.core import structures
        from exciting_environments_tpu.ops.pallas.pendulum_fast import pendulum_fast_rollout

        def fast_link(st, a):
            th, om = pendulum_fast_rollout(env, st, a)
            return structures.replace(st, physical_state=env.PhysicalState(theta=th, omega=om))

        timed_chain(
            "pendulum_b65536_pallas_fast_math",
            fast_link,
            state,
            action_sets,
            batch * steps,
        )


def bench_fast_mechanics(batch=65536, steps=1024):
    """CartPole/Acrobot fused-kernel throughput, exact vs fast-math ops."""
    import exciting_environments_tpu as excenvs
    from exciting_environments_tpu.ops.pallas.stepper import env_fused_rollout

    if jax.default_backend() == "cpu":
        return
    for cls, name in [(excenvs.CartPole, "cartpole"), (excenvs.Acrobot, "acrobot")]:
        # time-major slabs + one jitted executable per call: the layout the
        # kernel streams (a batch-major slab costs a transposed copy per call)
        action_sets = [
            jax.random.uniform(
                jax.random.PRNGKey(60 + i), (steps, batch, 1), minval=-0.8, maxval=0.8
            )
            for i in range(4)
        ]
        for fast in (False, True):
            env = cls(batch_size=batch, tau=1e-4, fast_math=fast)
            _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(4), batch))
            timed_chain(
                f"{name}_b{batch}_pallas_fused{'_fast_math' if fast else ''}",
                lambda st, a, env=env: env_fused_rollout(env, st, a, time_major=True)[1],
                state,
                action_sets,
                batch * steps,
            )


def bench_pmsm_fast_mode_parity_gate(batch=65536, te=64):
    """Round-5 envelope GATE on fast-mode stochastic parity (r4 VERDICT item
    3): the fast scan (``_vmap_rollout_fast_noise``) is a third program
    structure whose tiny constraint dots can lower differently from the
    kernel pre-pass on rare inputs; the committed characterization
    (26/65536 deviating instances, 8.1e-2 max normalized dev at T=64) is
    pinned with ~3x headroom and HARD-ASSERTED here — a widening regression
    fails the harness.  (Exact mode stays bitwise-gated in ``bench_pmsm``.)
    """
    import exciting_environments_tpu as excenvs
    from exciting_environments_tpu.ops.pallas.pmsm_stepper import pmsm_fused_rollout

    if jax.default_backend() == "cpu":
        return
    env = excenvs.PMSM(
        batch_size=batch, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA,
        process_noise={"i_d": 0.5, "i_q": 0.5},
        observation_noise={"i_d": 0.5, "i_q": 0.5},
        noise_mode="fast",
    )
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(7), batch))
    a = jax.random.uniform(jax.random.PRNGKey(44), (batch, te, 2), minval=-0.3, maxval=0.3)
    _, l_s = env.vmap_rollout(state, a, te)
    _, l_f = pmsm_fused_rollout(env, state, a)
    pn = env.env_properties.physical_normalizations
    norm_dev = lambda n: jnp.abs(
        jnp.asarray(getattr(l_f.physical_state, n))
        - jnp.asarray(getattr(l_s.physical_state, n))
    ) * (2.0 / float(getattr(pn, n).max - getattr(pn, n).min))
    per_inst = jnp.maximum(norm_dev("i_d"), norm_dev("i_q"))
    n_dev = int(jnp.sum(per_inst > 0))
    max_nd = float(jnp.max(per_inst))
    keys_eq = bool(jnp.array_equal(jnp.asarray(l_f.PRNGKey), jnp.asarray(l_s.PRNGKey)))
    print(
        json.dumps(
            {
                "metric": "pmsm_fast_mode_parity_gate",
                "n_deviating": n_dev,
                "max_abs_norm_dev": max_nd,
                "final_keys_equal": keys_eq,
                "envelope": {"n_deviating": 100, "max_abs_norm_dev": 0.25},
                "value": max_nd,
                "unit": "max_abs_norm_dev_T64_b65536",
            }
        ),
        flush=True,
    )
    if not keys_eq:
        raise RuntimeError("fast-mode final keys diverged between kernel and scan")
    if n_dev > 100 or max_nd > 0.25:
        raise RuntimeError(
            f"fast-mode parity envelope exceeded: {n_dev} deviating instances "
            f"(limit 100), max normalized dev {max_nd} (limit 0.25) — the "
            f"third program structure regressed (see BENCHMARKS.md)"
        )


ALL = {
    "pendulum_readme": bench_pendulum_readme_loop,
    "headline": bench_pendulum_headline,
    "msd": bench_msd_stepper,
    "tsit5": bench_tsit5_sim_ahead,
    "fluid_tank": bench_fluid_tank_long_horizon,
    "pmsm": bench_pmsm,
    "pmsm_fast_parity": bench_pmsm_fast_mode_parity_gate,
    "fast_mechanics": bench_fast_mechanics,
}


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--only", nargs="*", choices=sorted(ALL), default=None)
    args = parser.parse_args()
    for key, fn in ALL.items():
        if args.only and key not in args.only:
            continue
        try:
            fn()
        except Exception as e:  # keep going; a flaky backend shouldn't kill the suite
            print(json.dumps({"metric": key, "error": f"{type(e).__name__}: {e}"[:200]}), flush=True)
