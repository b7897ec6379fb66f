"""Device: saturated-PMSM fused sim-ahead with gather reuse + int8 planes —
bit-exactness vs vmap_sim_ahead and chained-marginal throughput."""
import json, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import exciting_environments_tpu as excenvs
from exciting_environments_tpu.ops.pallas.pmsm_stepper import pmsm_fused_sim_ahead, pmsm_fused_rollout

B, T, K = 65536, 256, 4
env = excenvs.PMSM(batch_size=B, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA)
_, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B))
acts = [jax.random.uniform(jax.random.PRNGKey(30 + i), (B, T, 2), minval=-0.5, maxval=0.5)
        for i in range(K)]

# exactness vs the scan sim-ahead, short horizon (trajectory obs compared too)
a32 = acts[0][:, :32]
obs_r, _, last_r = env.vmap_sim_ahead(s0, a32, env.tau, env.tau)
obs_f, last_f = pmsm_fused_sim_ahead(env, s0, a32, env.tau, env.tau, gather="int8")
dev = float(jnp.max(jnp.abs(obs_f - obs_r)))
for n in ("i_d", "i_q", "torque", "epsilon"):
    dev = max(dev, float(jnp.max(jnp.abs(getattr(last_f.physical_state, n) - getattr(last_r.physical_state, n)))))
print(json.dumps({"metric": "pmsm_sat_fused_sim_ahead_int8_bitexact_dev", "value": dev}), flush=True)

# also step-mode trajectory (collect-style obs_stride=1) exactness with reuse
obs_t, last_t = pmsm_fused_rollout(env, s0, a32, obs_stride=1, gather="int8")
obs_v, last_v = env.vmap_rollout(s0, a32, 1)
devt = float(jnp.max(jnp.abs(obs_t - obs_v)))
print(json.dumps({"metric": "pmsm_sat_fused_traj_int8_bitexact_dev", "value": devt}), flush=True)

def chain_time(k):
    e = excenvs.PMSM(batch_size=B, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA)
    @jax.jit
    def chain(state, aa):
        # reduce the trajectory observations on-device: the relay ships ALL
        # output buffers host-ward (~15 MB/s) — a (B, T+1, obs) slab would
        # dominate the measurement
        acc = 0.0
        for i in range(k):
            obs, state = pmsm_fused_sim_ahead(e, state, aa[i], e.tau, e.tau, gather="int8")
            acc = acc + jnp.mean(obs)
        return acc, state
    aa = jnp.stack(acts[:k])
    out = chain(s0, aa); jax.block_until_ready(out)
    best = 1e9
    for rep in (1, 2):
        t0 = time.perf_counter()
        acc, st = chain(s0, aa * (1.0 + 1e-3 * rep))
        f = float(jnp.mean(st.physical_state.i_d)) + float(acc)
        assert jnp.isfinite(f)
        best = min(best, time.perf_counter() - t0)
    return best

t1 = chain_time(1)
tk = chain_time(K)
marg = (tk - t1) / (K - 1)
ok = (tk - t1) > 0.3 * t1
val = B * T / marg if ok else B * T * K / tk
print(json.dumps({"metric": "pmsm_sat_fused_sim_ahead_int8_steps_per_s", "value": val,
                  "t1": t1, "tk": tk, "scaling_ok": ok}), flush=True)
print("SIM AHEAD DEVICE DONE", flush=True)
