"""Device: MPPI planning through the fused Pallas kernels.

The fused planning backend folds the sample axis into the kernel batch, so
each control step's candidate sweep (n_samples x batch x horizon env steps)
runs as ONE kernel rollout instead of a lax.scan of vmap_step.  Same
chained-marginal methodology as mpc_device.py (control steps are
sequentially data-dependent through state + warm-started plan).
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.utils.episodes import reset_with_references
from exciting_environments_tpu.utils.mpc import MPPIConfig, planning_path, run_mppi


def bench(tag, env, cfg, k1, k2, fused):
    _, state0 = jax.jit(lambda k: reset_with_references(env, k))(jax.random.PRNGKey(0))
    steps_per_ctrl = cfg.n_samples * env.batch_size * cfg.horizon * cfg.n_iterations + env.batch_size

    def run(n_steps, seed):
        t0 = time.perf_counter()
        res = run_mppi(env, state0, n_steps, key=jax.random.PRNGKey(seed),
                       config=cfg, fused=fused)
        fence = float(jnp.mean(res.rewards))
        dt = time.perf_counter() - t0
        if not jnp.isfinite(fence):
            raise RuntimeError(f"{tag}: non-finite rewards")
        return fence, dt

    for n in (k1, k2):
        r, dt = run(n, seed=100 + n)
        print(f"{tag} compile+run n={n}: {dt:.2f}s mean_reward={r:.4f}", flush=True)
    best1 = min(run(k1, seed=s)[1] for s in (1, 2))
    best2 = min(run(k2, seed=s)[1] for s in (3, 4))
    marginal = (best2 - best1) / (k2 - k1)
    print(json.dumps({
        "metric": f"mppi_{tag}_candidate_steps_per_s",
        "value": steps_per_ctrl / marginal,
        "unit": "candidate-env-steps/s (plan+apply per control step)",
        "config": f"b{env.batch_size}_samples{cfg.n_samples}_h{cfg.horizon}_iter{cfg.n_iterations}",
        "fused_path": planning_path(env, cfg),
        "ctrl_steps_per_s": 1.0 / marginal,
        "k1": k1, "k2": k2, "t_k1": best1, "t_k2": best2,
        "scaling_ok": bool(best2 > best1 * 1.2),
    }), flush=True)


CFG_PEND = MPPIConfig(horizon=32, n_samples=64, temperature=0.05,
                      noise_sigma=0.5, n_iterations=1, smoothing=0.5)
env_p = excenvs.Pendulum(batch_size=4096, tau=2e-2, control_state=["theta"])
print("pendulum planning_path:", planning_path(env_p, CFG_PEND), flush=True)
# scan backend wins for cheap ODEs (see BENCHMARKS.md): measured once below
bench("pendulum_fused", env_p, CFG_PEND, 32, 256, fused=True)

CFG_PMSM = MPPIConfig(horizon=16, n_samples=64, temperature=0.05,
                      noise_sigma=0.3, n_iterations=1, smoothing=0.5)
env_m = excenvs.PMSM(batch_size=512, saturated=True,
                     motor_variant=excenvs.MotorVariant.BRUSA,
                     control_state=["i_d", "i_q"])
print("pmsm planning_path:", planning_path(env_m, CFG_PMSM), flush=True)
bench("pmsm_saturated_fused", env_m, CFG_PMSM, 64, 512, fused=True)
bench("pmsm_saturated_scan", env_m, CFG_PMSM, 8, 32, fused=False)
