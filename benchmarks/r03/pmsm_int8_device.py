"""Device A/B: saturated-PMSM fused kernel with bf16x3 vs int8x4 gather —
bit-exactness vs the scan and chained-marginal throughput."""
import json, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import exciting_environments_tpu as excenvs
from exciting_environments_tpu.ops.pallas.pmsm_stepper import pmsm_fused_rollout

B, T, K = 65536, 512, 4
env = excenvs.PMSM(batch_size=B, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA)
_, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B))
acts = [jax.random.uniform(jax.random.PRNGKey(10 + i), (B, T, 2), minval=-0.5, maxval=0.5)
        for i in range(K)]

# exactness vs the scan on short horizon first
a64 = acts[0][:, :64]
obs_s, last_s = env.vmap_rollout(s0, a64, 64)
for mode in ("dot", "int8"):
    e = excenvs.PMSM(batch_size=B, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA)
    obs_f, last_f = pmsm_fused_rollout(e, s0, a64, gather=mode)
    dev = max(float(jnp.max(jnp.abs(getattr(last_f.physical_state, n) - getattr(last_s.physical_state, n))))
              for n in ("i_d", "i_q", "torque", "epsilon", "u_d_buffer", "u_q_buffer"))
    print(json.dumps({"metric": f"pmsm_sat_fused_{mode}_bitexact_dev", "value": dev}), flush=True)

def chain_time(mode, k):
    e = excenvs.PMSM(batch_size=B, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA)
    @jax.jit
    def chain(state, aa):
        for i in range(k):
            _, state = pmsm_fused_rollout(e, state, aa[i], gather=mode)
        return state
    aa = jnp.stack(acts[:k])
    out = chain(s0, aa); jax.block_until_ready(out)
    best = 1e9
    for rep in (1, 2):
        scaled = aa * (1.0 + 1e-3 * rep)
        t0 = time.perf_counter()
        out = chain(s0, scaled)
        f = float(jnp.mean(out.physical_state.i_d))
        assert jnp.isfinite(f)
        best = min(best, time.perf_counter() - t0)
    return best

for mode in ("dot", "int8"):
    t1 = chain_time(mode, 1)
    tk = chain_time(mode, K)
    marg = (tk - t1) / (K - 1)
    val = B * T / marg if (tk - t1) > 0.3 * t1 else B * T * K / tk
    print(json.dumps({"metric": f"pmsm_sat_fused_{mode}_steps_per_s", "value": val,
                      "t1": t1, "tk": tk, "scaling_ok": (tk - t1) > 0.3 * t1}), flush=True)
print("AB DONE", flush=True)
