"""Device: fleet-scale iLQR planning.

A batch of B independent iLQR solves (each: nominal rollout + backward
Riccati sweep with per-step jacobian/hessian re-linearization + a parallel
line search of forward rollouts) runs as ONE vmapped jitted program.
Throughput is reported as linearized-step-evaluations/s: per iteration each
instance evaluates H backward re-linearizations plus ``len(alphas)`` forward
rollouts of H steps.

Timing methodology per CLAUDE.md: iterations chain through the scan carry,
so the marginal time between two iteration counts is trustworthy; the fetch
of the reduced cost curve fences the timed region.
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.utils import ilqr
from exciting_environments_tpu.utils.episodes import reset_with_references

B, H = 4096, 32
K1, K2 = 4, 64
N_ALPHA = 5

env = excenvs.Pendulum(batch_size=B, tau=2e-2, control_state=["theta"])
_, state = jax.jit(lambda k: reset_with_references(env, k))(jax.random.PRNGKey(0))
u0 = jnp.zeros((B, H, 1))


def run(iters, rep=0):
    # fresh args per timed repeat (relay (executable, args) cache, CLAUDE.md)
    u = u0 + 1e-6 * rep
    t0 = time.perf_counter()
    res = ilqr.ilqr_plan(env, state, u, iterations=iters)
    fence = float(res.costs[-1])  # device->host fetch closes the timed region
    return fence, time.perf_counter() - t0


for it in (K1, K2):  # warm both compiles
    fence, dt = run(it)
    print(f"compile+run iters={it}: {dt:.2f}s mean-cost={fence:.4f}", flush=True)

c1, t1 = run(K1, rep=1)
c2, t2 = run(K2, rep=2)
marginal = (t2 - t1) / (K2 - K1)
# per iteration per instance: H backward re-linearizations + N_ALPHA*H forward steps
step_evals = B * H * (1 + N_ALPHA)
value = step_evals / marginal
print(f"t1={t1:.3f}s t2={t2:.3f}s marginal={marginal * 1e3:.2f} ms/iter", flush=True)
print(f"linearized-step-evals/s: {value:.3e} (final mean cost {c2:.4f})", flush=True)
print(json.dumps({
    "metric": "ilqr_fleet_step_evals_per_s",
    "value": value,
    "unit": "linearized/forward step evaluations per s across the fleet",
    "config": f"pendulum_b{B}_H{H}_alphas{N_ALPHA}",
    "k1": K1, "k2": K2, "t_k1": t1, "t_k2": t2,
    "scaling_ok": bool(t2 > t1 * 1.2),
    "final_mean_cost": c2,
}), flush=True)
