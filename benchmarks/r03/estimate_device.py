"""Device: fleet-scale parallel EKF state estimation.

A batch of B independent extended Kalman filters (one per plant in a fleet)
runs as ONE vmapped ``lax.scan`` program: each filter step re-linearizes the
env's own differentiable step (``jax.jacobian`` of ``_ode_solver_step``),
so the per-step work is a handful of tiny matmuls plus one env transition —
exactly the estimator a monitoring fleet would run next to the simulation.

Timing methodology per CLAUDE.md: filter iterations are sequentially
data-dependent (the belief chains through the scan), so the marginal time
between two horizon lengths is trustworthy; results are fetched as reduced
host scalars.
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.utils import estimate

TAU = 1e-2
B = 8192
T1, T2 = 256, 8192  # marginal between the two amortizes compile + relay latency

env = excenvs.Pendulum(batch_size=B, tau=TAU, observation_noise={"theta": 0.08})
keys = jax.random.split(jax.random.PRNGKey(0), B)
state0 = env.vmap_reset(keys)[1]
t_grid = jnp.arange(T2) * TAU
actions = jnp.broadcast_to(0.3 * jnp.sin(2.0 * t_grid)[None, :, None], (B, T2, 1))
obs, _ = env.vmap_rollout(state0, actions)
print("data", obs.shape, float(jnp.abs(obs[:, :, :2]).max()), flush=True)


def run(T, rep=0):
    # vary inputs per repeat: the relay caches identical (executable, args)
    # executions (CLAUDE.md), so timed runs must differ from the warmups
    o = obs[:, :T] * (1.0 + 1e-9 * rep)
    t0 = time.perf_counter()
    res = estimate.run_ekf(
        env, o, actions[:, :T],
        measured_fields=("theta",), process_std={"omega": 0.05},
    )
    fence = float(jnp.mean(res.nll))  # device->host fetch closes the timed region
    return fence, time.perf_counter() - t0


for T in (T1, T2):  # warm both compiles
    fence, dt = run(T)
    print(f"compile+run T={T}: {dt:.2f}s nll/step={fence / T:.3f}", flush=True)

_, t1 = run(T1, rep=1)
_, t2 = run(T2, rep=2)
marginal = (t2 - t1) / (T2 - T1)
value = B / marginal  # B filter updates per scan step
print(f"t1={t1:.3f}s t2={t2:.3f}s marginal={marginal * 1e3:.3f} ms/step", flush=True)
print(f"parallel EKF updates/s: {value:.3e}", flush=True)
print(json.dumps({
    "metric": "ekf_fleet_updates_per_s",
    "value": value,
    "unit": "filter-updates/s (predict + Jacobian relinearization + update)",
    "config": f"pendulum_b{B}_theta_measured_omega_reconstructed",
    "t_k1": t1, "t_k2": t2, "k1": T1, "k2": T2,
    "scaling_ok": bool(t2 > t1 * 1.2),
}), flush=True)
