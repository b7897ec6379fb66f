"""Device A/B: trig-free fast PMSM kernel with bf16x3 vs int8x4 gather."""
import json, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import exciting_environments_tpu as excenvs
from exciting_environments_tpu.ops.pallas.pmsm_fast_kernel import pmsm_fast_fused_rollout

B, T, K = 65536, 512, 4
env = excenvs.PMSM(batch_size=B, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA)
_, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B))
acts = [jax.random.uniform(jax.random.PRNGKey(20 + i), (B, T, 2), minval=-0.5, maxval=0.5)
        for i in range(K)]

def chain_time(mode, k):
    e = excenvs.PMSM(batch_size=B, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA)
    @jax.jit
    def chain(state, aa):
        for i in range(k):
            state = pmsm_fast_fused_rollout(e, state, aa[i], gather=mode)
        return state
    aa = jnp.stack(acts[:k])
    out = chain(s0, aa); jax.block_until_ready(out)
    best = 1e9
    for rep in (1, 2):
        scaled = aa * (1.0 + 1e-3 * rep)
        jax.block_until_ready(scaled)
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
    print(json.dumps({"metric": f"pmsm_fast_kernel_{mode}_steps_per_s", "value": val,
                      "t1": t1, "tk": tk, "scaling_ok": (tk - t1) > 0.3 * t1}), flush=True)
print("FAST AB DONE", flush=True)
