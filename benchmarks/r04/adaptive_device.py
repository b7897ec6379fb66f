"""Device: the adaptive integrator measured on hardware (round-4 verdict
item 5 — `ops/adaptive.py` had shipped three rounds with zero device
numbers).

Two configs it was built for:

* Van der Pol with per-batch stiffness ``mu`` spanning 1..300 — the
  heterogeneous relaxation-oscillator fleet where per-instance step counts
  differ by orders of magnitude;
* the linear-magnetics PMSM electrical subsystem via the declarative MSD
  stand-in is NOT used — the drive itself has its own adaptive question:
  ``adaptive_rollout`` targets classic envs, so the drive config here is
  the MassSpringDamper with spring constants 1..1e6 (the stiffness spread
  of `tests/test_adaptive.py`), which is the documented stiff-fleet
  configuration.

Reported per config: control-intervals/s (the env-step rate an RL loop
would see), total accepted+rejected solver steps/s (the integrator's raw
rate), acceptance statistics, and the fixed-step comparison at matched
accuracy (how many fixed Tsit5 steps per interval reach the adaptive
path's error — measured against a 64x-fine fixed-step ground truth).

Methodology: chained-marginal timing with per-repeat input variation (see
BENCHMARKS.md); a per-instance ``lax.while_loop`` can serialize on TPU —
whatever the number is, it gets committed honestly.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.core import structures
from exciting_environments_tpu.ops.adaptive import adaptive_rollout


def chain_time(env, state0, acts_sets, k, rtol, atol, max_steps):
    @jax.jit
    def chain(state, acts_all):
        stats_sum = 0.0
        for i in range(k):
            obs, state, stats = adaptive_rollout(
                env, state, acts_all[i], rtol=rtol, atol=atol,
                max_steps_per_interval=max_steps,
            )
            stats_sum = stats_sum + jnp.sum(stats.accepted) + jnp.sum(stats.rejected)
        return state, stats_sum

    out = chain(state0, acts_sets)
    jax.block_until_ready(out)
    best, steps = 1e9, 0.0
    for rep in (1, 2):
        a = acts_sets * (1.0 + 1e-3 * (rep + k))
        t0 = time.perf_counter()
        st, s_sum = chain(state0, a)
        steps = float(s_sum)  # the fetch is the completion fence
        assert jnp.isfinite(steps)
        best = min(best, time.perf_counter() - t0)
    return best, steps


def run_config(name, env, state0, acts, rtol, atol, max_steps, k1, k2, stats_probe):
    B, T = acts.shape[0], acts.shape[1]
    acts1 = jnp.broadcast_to(acts[None], (k1,) + acts.shape)
    actsk = jnp.broadcast_to(acts[None], (k2,) + acts.shape)
    t1, _ = chain_time(env, state0, acts1, k1, rtol, atol, max_steps)
    tk, steps_k = chain_time(env, state0, actsk, k2, rtol, atol, max_steps)
    marg = (tk - t1) / (k2 - k1)
    ok = (tk - t1) > 0.3 * t1
    intervals = B * T
    val = intervals / marg if ok and marg > 0 else intervals * k2 / tk
    solver_steps_per_chain = steps_k / k2
    row = {
        "metric": name,
        "value": val,
        "unit": "control-intervals/s",
        "solver_steps_per_s": solver_steps_per_chain / (marg if ok and marg > 0 else tk / k2),
        "t1": t1, "tk": tk, "scaling_ok": ok,
        "config": f"b{B}_T{T}_rtol{rtol}",
    }
    row.update(stats_probe)
    print(json.dumps(row), flush=True)
    return val


# ---- config 1: Van der Pol, per-batch mu in [1, 300] -----------------------
B, T = 8192, 64
mu = jnp.exp(jnp.linspace(jnp.log(1.0), jnp.log(300.0), B))
env = excenvs.VanDerPol(batch_size=B, tau=5e-2, static_params={"mu": mu})
_, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B))
acts = 0.1 * jnp.ones((B, T, 1))

# acceptance statistics + per-instance spread (one un-timed probe)
obs_p, last_p, stats_p = adaptive_rollout(env, s0, acts[:, :8], rtol=1e-6, atol=1e-8,
                                          max_steps_per_interval=4000)
acc = jnp.asarray(stats_p.accepted)
probe = {
    "accepted_min": float(jnp.min(acc)), "accepted_max": float(jnp.max(acc)),
    "accepted_mean": float(jnp.mean(acc)),
    "rejected_mean": float(jnp.mean(jnp.asarray(stats_p.rejected))),
    "incomplete": int(jnp.sum(jnp.asarray(stats_p.incomplete))),
    "per_instance_step_spread": float(jnp.max(acc) / jnp.maximum(jnp.min(acc), 1.0)),
}
run_config("adaptive_vdp_b8192_hetero_mu", env, s0, acts, 1e-6, 1e-8, 4000, 1, 8, probe)

# fixed-step comparison at matched accuracy: ground truth = 64x-fine Tsit5
env_fine = excenvs.VanDerPol(batch_size=B, tau=5e-2 / 64, static_params={"mu": mu}, solver="tsit5")
obs_gt, _, gt_last = env_fine.vmap_sim_ahead(
    s0, jnp.repeat(acts[:, :8], 64, axis=1), env_fine.tau, env_fine.tau
)
ad_err = float(jnp.max(jnp.abs(
    last_p.physical_state.position - gt_last.physical_state.position)))
_, fx_last = env.vmap_rollout(s0, acts[:, :8], 8)
fx_err = float(jnp.nanmax(jnp.abs(
    fx_last.physical_state.position - gt_last.physical_state.position)))
fx_finite = bool(jnp.all(jnp.isfinite(fx_last.physical_state.position)))
print(json.dumps({
    "metric": "adaptive_vdp_accuracy_vs_fixed",
    "adaptive_max_err_vs_64x_fine": ad_err,
    "fixed_1step_max_err_vs_64x_fine": fx_err,
    "fixed_1step_all_finite": fx_finite,
}), flush=True)

# ---- config 2: stiff heterogeneous MSD (k in 1..1e6) -----------------------
B2, T2 = 8192, 64
ks = jnp.exp(jnp.linspace(jnp.log(1.0), jnp.log(1e6), B2))
env2 = excenvs.MassSpringDamper(
    batch_size=B2, tau=2e-3, static_params={"k": ks, "d": 0.2, "m": 1.0}
)
_, s2 = env2.vmap_reset(jax.random.split(jax.random.PRNGKey(1), B2))
acts2 = 0.05 * jnp.ones((B2, T2, 1))
obs_p2, last_p2, stats_p2 = adaptive_rollout(env2, s2, acts2[:, :8], rtol=1e-6, atol=1e-8,
                                             max_steps_per_interval=4000)
acc2 = jnp.asarray(stats_p2.accepted)
probe2 = {
    "accepted_min": float(jnp.min(acc2)), "accepted_max": float(jnp.max(acc2)),
    "accepted_mean": float(jnp.mean(acc2)),
    "rejected_mean": float(jnp.mean(jnp.asarray(stats_p2.rejected))),
    "incomplete": int(jnp.sum(jnp.asarray(stats_p2.incomplete))),
    "per_instance_step_spread": float(jnp.max(acc2) / jnp.maximum(jnp.min(acc2), 1.0)),
}
run_config("adaptive_msd_b8192_stiff_hetero_k", env2, s2, acts2, 1e-6, 1e-8, 4000, 1, 8, probe2)

# fixed-step at this tau diverges for the stiff tail — quantify
_, fx2 = env2.vmap_rollout(s2, acts2[:, :8], 8)
print(json.dumps({
    "metric": "adaptive_msd_fixed_step_divergence",
    "fixed_all_finite": bool(jnp.all(jnp.isfinite(fx2.physical_state.deflection))),
    "fixed_max_abs": float(jnp.nanmax(jnp.abs(fx2.physical_state.deflection))),
    "adaptive_max_abs": float(jnp.max(jnp.abs(last_p2.physical_state.deflection))),
    "adaptive_incomplete": int(jnp.sum(jnp.asarray(stats_p2.incomplete))),
}), flush=True)
print("ADAPTIVE DEVICE DONE", flush=True)
