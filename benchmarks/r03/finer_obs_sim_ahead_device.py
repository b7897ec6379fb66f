"""Device: fused Tsit5 ``sim_ahead`` with a FINER observation grid.

BASELINE config 3 semantics (reference ``core_env.py:427-488``: solver steps
on the observation grid, each action held ``action_stepsize / obs_stepsize``
steps) with ``obs_stepsize < action_stepsize`` — the scope round 3 added to
``env_fused_sim_ahead``.  Parity-gates the kernel against ``vmap_sim_ahead``
on the same inputs, then measures the scaling-gated chained marginal.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.ops.pallas.stepper import env_fused_sim_ahead
from benchmarks.run_benchmarks import timed_chain

B, N_ACT, RATIO = 65536, 256, 8
OBS_DT, ACT_DT = 2e-3, 1.6e-2  # ratio 8: 2048 solver steps per link

env = excenvs.CartPole(batch_size=B, solver="tsit5")
_, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(1), B))
action_sets = [
    jax.random.uniform(jax.random.PRNGKey(50 + i), (B, N_ACT, env.action_dim), minval=-0.5, maxval=0.5)
    for i in range(8)
]

# parity gate vs the scan path (same 1e-3 absolute budget as the equal-grid
# gate in run_benchmarks.py; XLA-vs-Mosaic division rounding ~1 ulp/step).
# Runs on a SMALLER batch: the full-trajectory save buffer (64 obs-grid
# saves x tile x 4 state fields) must fit the 16 MB scoped-VMEM limit — at
# b=65536 the (512,128) tile would need a 24 MB save block (device OOM);
# the timed runs below save only the final state and are VMEM-light.
BP = 8192
envp = excenvs.CartPole(batch_size=BP, solver="tsit5")
_, statep = envp.vmap_reset(jax.random.split(jax.random.PRNGKey(1), BP))
a_small = action_sets[0][:BP, :8]
obs_r, _, last_r = envp.vmap_sim_ahead(statep, a_small, OBS_DT, ACT_DT)
obs_f, last_f = env_fused_sim_ahead(envp, statep, a_small, OBS_DT, ACT_DT, strict=True)
dev_state = max(
    float(jnp.max(jnp.abs(jnp.asarray(getattr(last_r.physical_state, n))
                          - jnp.asarray(getattr(last_f.physical_state, n)))))
    for n in envp._ode_state_fields
)
dev_obs = float(jnp.max(jnp.abs(obs_r - obs_f)))
if not (dev_state < 1e-3 and dev_obs < 1e-3):
    raise RuntimeError(f"finer-obs fused sim_ahead deviates: state {dev_state}, obs {dev_obs}")
print(json.dumps({
    "metric": f"cartpole_b{BP}_tsit5_finer_obs_fused_agreement",
    "value": dev_state, "obs_dev": dev_obs,
    "unit": "max_abs_dev_vs_scan_64steps", "ratio": RATIO,
}), flush=True)

n_steps = N_ACT * RATIO
timed_chain(
    f"cartpole_b{B}_tsit5_finer_obs_r{RATIO}_pallas_fused_sim_ahead",
    lambda st, a: env_fused_sim_ahead(env, st, a, OBS_DT, ACT_DT, obs_stride=n_steps, strict=True)[1],
    state,
    action_sets,
    B * n_steps,  # env-steps counted on the solver (= observation) grid
    k_chain=8,
)
print("FINER OBS DONE", flush=True)
