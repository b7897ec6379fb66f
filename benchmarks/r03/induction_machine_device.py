"""Device: InductionMachine fused rollout + rotor-flux observer fleet.

The drive-flavored extensibility proof measured on hardware: the declarative
SCIM rides the generic fused Pallas kernel with no kernel code, and the EKF
rebuilds the unmeasurable rotor flux for a whole fleet.  Chained-marginal
methodology (see BENCHMARKS.md); inputs vary per repeat (relay cache).
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
from exciting_environments_tpu.ops.pallas import rollout_path
from exciting_environments_tpu.ops.pallas.stepper import env_fused_rollout
from exciting_environments_tpu.utils import estimate

B, T = 65536, 4096  # A=2 doubles the action slab vs the 1-action envs; T=4096 keeps it ~2 GB
K1, K2 = 2, 64  # one link is only ~2.7 ms (HBM-bound) — span the chain well past the ~120 ms dispatch+fetch constant
env = excenvs.InductionMachine(batch_size=B)
assert rollout_path(env) == "fused"
_, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B))
acts = jax.random.uniform(jax.random.PRNGKey(1), (T, B, 2), minval=-0.3, maxval=0.3)


def chain_time(k):
    @jax.jit
    def chain(state, a):
        for _ in range(k):
            _, state = env_fused_rollout(env, state, a, time_major=True)
        return state

    out = chain(s0, acts)
    jax.block_until_ready(out)
    best = 1e9
    for rep in (1, 2):
        a = acts * (1.0 + 1e-3 * (rep + k))  # vary per repeat AND per k: relay caches args
        t0 = time.perf_counter()
        st = chain(s0, a)
        f = float(jnp.mean(st.physical_state.psi_rd))
        assert jnp.isfinite(f)
        best = min(best, time.perf_counter() - t0)
    return best


t1 = chain_time(K1)
tk = chain_time(K2)
marg = (tk - t1) / (K2 - K1)
ok = (tk - t1) > 0.3 * t1
val = B * T / marg if ok and marg > 0 else B * T * K2 / tk

# agreement vs the scan path on a short horizon (device f32)
a16 = acts[:16]
obs_f, last_f = env_fused_rollout(env, s0, a16, time_major=True)
obs_s, last_s = env.vmap_rollout(s0, jnp.transpose(a16, (1, 0, 2)), 16)
dev = float(jnp.max(jnp.abs(obs_f - obs_s[:, -1])))

print(json.dumps({
    "metric": "induction_machine_b65536_pallas_fused",
    "value": val, "unit": "env-steps/s",
    "t1": t1, "tk": tk, "scaling_ok": ok,
    "fused_vs_scan_max_abs_dev_16steps": dev,
}), flush=True)

# --- rotor-flux observer fleet (4-state EKF from noisy current sensors) ---
BE, TE = 4096, 2048
KE1, KE2 = 1, 4
envn = excenvs.InductionMachine(
    batch_size=BE, observation_noise={"i_sd": 0.5, "i_sq": 0.5}
)
keys = jax.random.split(jax.random.PRNGKey(2), BE)
st = envn.vmap_reset(keys)[1]
w_s = float(envn.env_properties.static_params.omega) / 0.96
t_grid = jnp.arange(TE) * envn.tau
acts_e = 0.4 * jnp.broadcast_to(
    jnp.stack([jnp.cos(w_s * t_grid), jnp.sin(w_s * t_grid)], axis=-1)[None], (BE, TE, 2)
)
obs_e, _ = envn.vmap_rollout(st, acts_e)


def ekf_chain_time(k):
    # Chained-marginal for the filter too: link j's observations are scaled
    # by link j-1's nll scalar, so the k filter passes are sequentially
    # data-dependent inside ONE jitted program (relay early-fetch defeated).
    @jax.jit
    def chain(o):
        nll = jnp.float32(0.0)
        for _ in range(k):
            res = estimate.run_ekf(
                envn, o * (1.0 + 1e-12 * nll), acts_e,
                measured_fields=("i_sd", "i_sq"),
                process_std={"psi_rd": 0.02, "psi_rq": 0.02},
            )
            nll = jnp.mean(res.nll)
        return nll

    jax.block_until_ready(chain(obs_e))
    best = 1e9
    for rep in (1, 2):
        o = obs_e * (1.0 + 1e-9 * (rep + k))
        t0 = time.perf_counter()
        f = float(chain(o))
        assert jnp.isfinite(f)
        best = min(best, time.perf_counter() - t0)
    return best


te1 = ekf_chain_time(KE1)
te2 = ekf_chain_time(KE2)
marg_e = (te2 - te1) / ((KE2 - KE1) * TE)
ok_e = (te2 - te1) > 0.3 * te1
val_e = BE / marg_e if ok_e and marg_e > 0 else BE * TE * KE2 / te2
print(json.dumps({
    "metric": "ekf_induction_machine_flux_observer_updates_per_s",
    "value": val_e,
    "unit": "4-state filter-updates/s (rotor flux reconstructed from noisy currents)",
    "config": f"scim_b{BE}_currents_measured",
    "t_k1": te1, "t_k2": te2, "k1": KE1, "k2": KE2,
    "scaling_ok": ok_e,
}), flush=True)
print("INDUCTION MACHINE DEVICE DONE", flush=True)
