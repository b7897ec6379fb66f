"""Device: TPU-scale receding-horizon MPPI.

The planner's sample sweep is pure batch: each control step of `run_mppi`
evaluates n_samples x batch_size x horizon candidate env steps (a vmapped
lax.scan of vmap_step) plus one applied step, and the whole receding-
horizon loop is ONE jitted lax.scan over control steps.  Timing methodology
per CLAUDE.md: control steps are sequentially data-dependent (the state and
the warm-started plan chain through the scan), so the marginal time between
two control-horizon lengths is trustworthy; the timed region ends with a
reduced-scalar fetch and inputs (keys) vary per run.
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.utils.episodes import reset_with_references
from exciting_environments_tpu.utils.mpc import MPPIConfig, run_mppi

B, K, H = 4096, 64, 32
CFG = MPPIConfig(horizon=H, n_samples=K, temperature=0.05, noise_sigma=0.5,
                 n_iterations=1, smoothing=0.5)
K1, K2 = 32, 256  # long chains: marginal must dominate per-call tracing overhead

env = excenvs.Pendulum(batch_size=B, tau=2e-2, control_state=["theta"])
_, state0 = jax.jit(lambda k: reset_with_references(env, k))(jax.random.PRNGKey(0))
# candidate env-steps per control step (plus the one applied step)
steps_per_ctrl = K * B * H * CFG.n_iterations + B


def run(n_steps, seed):
    t0 = time.perf_counter()
    res = run_mppi(env, state0, n_steps, key=jax.random.PRNGKey(seed), config=CFG)
    mean_rew = float(jnp.mean(res.rewards))  # reduced-scalar fetch = the fence
    dt = time.perf_counter() - t0
    if not jnp.isfinite(mean_rew):
        raise RuntimeError("non-finite MPPI rewards")
    return mean_rew, dt


for n in (K1, K2):
    r, dt = run(n, seed=100 + n)
    print(f"compile+run n_steps={n}: {dt:.2f}s mean_reward={r:.4f}", flush=True)

best1 = min(run(K1, seed=s)[1] for s in (1, 2))
best2 = min(run(K2, seed=s)[1] for s in (3, 4))
marginal = (best2 - best1) / (K2 - K1)
value = steps_per_ctrl / marginal
ok_scaling = best2 > best1 * 1.2
print(f"t[{K1}]={best1:.3f}s t[{K2}]={best2:.3f}s marginal={marginal*1e3:.2f} ms/ctrl-step", flush=True)
print(json.dumps({
    "metric": "mppi_receding_horizon_candidate_steps_per_s",
    "value": value,
    "unit": "candidate-env-steps/s (plan+apply per control step)",
    "config": f"pendulum_b{B}_samples{K}_h{H}_iter{CFG.n_iterations}",
    "ctrl_steps_per_s": 1.0 / marginal,
    "k1": K1, "k2": K2, "t_k1": best1, "t_k2": best2,
    "scaling_ok": bool(ok_scaling),
}), flush=True)
