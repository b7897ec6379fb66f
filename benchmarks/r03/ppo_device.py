"""Device: TPU PPO training throughput (utils/rl.py, scan_iterations mode).

One PPO iteration = a 128-step vectorized rollout with same-step autoreset
(n_steps x batch env steps) + GAE + 4 epochs x 4 minibatches of clipped-
surrogate updates; scan_iterations=True folds ALL iterations into one
jitted lax.scan, so the whole training run is a single device dispatch.
Timing methodology per CLAUDE.md: iterations chain through params/opt
state/env state (sequentially data-dependent), so the marginal time
between two iteration counts is trustworthy; the timed region ends with a
reduced-scalar fetch of the metrics and keys vary per run.
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.utils.rl import PPOConfig, train_ppo

B = 4096  # 16384 reproducibly crashes the relay TPU worker (2x, fresh processes)
CFG = PPOConfig(n_steps=128, n_epochs=4, n_minibatches=4, max_episode_steps=256)
K1, K2 = 16, 128  # iterations per timed program

env = excenvs.Pendulum(batch_size=B, tau=2e-2, control_state=["theta"])
steps_per_iter = CFG.n_steps * B


def run(iters, seed):
    t0 = time.perf_counter()
    res = train_ppo(env, iters, key=jax.random.PRNGKey(seed), config=CFG,
                    scan_iterations=True)
    fence = float(res.metrics["mean_reward"][-1])  # metrics fetch = the fence
    dt = time.perf_counter() - t0
    if not jnp.isfinite(fence):
        raise RuntimeError("non-finite PPO metrics")
    return res, dt


for n in (K1, K2):
    res, dt = run(n, seed=100 + n)
    print(f"compile+run iters={n}: {dt:.2f}s last mean_reward="
          f"{res.metrics['mean_reward'][-1]:.4f}", flush=True)

best1 = min(run(K1, seed=s)[1] for s in (1, 2))
best2 = min(run(K2, seed=s)[1] for s in (3, 4))
marginal = (best2 - best1) / (K2 - K1)
value = steps_per_iter / marginal
ok_scaling = best2 > best1 * 1.2
print(f"t[{K1}]={best1:.3f}s t[{K2}]={best2:.3f}s marginal={marginal*1e3:.2f} ms/iter", flush=True)
print(json.dumps({
    "metric": "ppo_train_env_steps_per_s",
    "value": value,
    "unit": "env-steps/s (rollout + GAE + 16 minibatch updates per iteration)",
    "config": f"pendulum_b{B}_nsteps{CFG.n_steps}_ep{CFG.n_epochs}x{CFG.n_minibatches}",
    "iters_per_s": 1.0 / marginal,
    "k1": K1, "k2": K2, "t_k1": best1, "t_k2": best2,
    "scaling_ok": bool(ok_scaling),
}), flush=True)
