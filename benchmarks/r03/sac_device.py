"""Device: TPU SAC training throughput (utils/sac.py).

One SAC iteration = n_steps x batch env steps (same-step autoreset) +
ring-buffer insertion + M critic/actor/temperature updates with polyak
target tracking, all one dispatch.  Chained-marginal timing (iterations
chain through params/buffer/env state); reduced-scalar fence; varied keys.
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.utils.sac import SACConfig, train_sac

B = 4096
CFG = SACConfig(n_steps=8, updates_per_iteration=8, update_batch_size=4096,
                buffer_capacity=2**19, learning_starts=2**15,
                max_episode_steps=256)
K1, K2 = 16, 128

env = excenvs.Pendulum(batch_size=B, tau=2e-2, control_state=["theta"])
steps_per_iter = CFG.n_steps * B


def run(iters, seed):
    t0 = time.perf_counter()
    res = train_sac(env, iters, key=jax.random.PRNGKey(seed), config=CFG,
                    scan_iterations=True)
    fence = float(res.metrics["mean_reward"][-1])
    dt = time.perf_counter() - t0
    if not jnp.isfinite(fence):
        raise RuntimeError("non-finite SAC metrics")
    return res, dt


for n in (K1, K2):
    res, dt = run(n, seed=100 + n)
    print(f"compile+run iters={n}: {dt:.2f}s last mean_reward="
          f"{res.metrics['mean_reward'][-1]:.4f} q_loss={res.metrics['q_loss'][-1]:.3f}",
          flush=True)

best1 = min(run(K1, seed=s)[1] for s in (1, 2))
best2 = min(run(K2, seed=s)[1] for s in (3, 4))
marginal = (best2 - best1) / (K2 - K1)
print(f"t[{K1}]={best1:.3f}s t[{K2}]={best2:.3f}s marginal={marginal*1e3:.2f} ms/iter", flush=True)
print(json.dumps({
    "metric": "sac_train_env_steps_per_s",
    "value": steps_per_iter / marginal,
    "unit": "env-steps/s (env steps + ring buffer + 8 SAC updates per iteration)",
    "config": f"pendulum_b{B}_nsteps{CFG.n_steps}_upd{CFG.updates_per_iteration}x{CFG.update_batch_size}",
    "iters_per_s": 1.0 / marginal,
    "k1": K1, "k2": K2, "t_k1": best1, "t_k2": best2,
    "scaling_ok": bool(best2 > best1 * 1.2),
}), flush=True)
