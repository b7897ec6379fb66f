"""Device: VanDerPol fused rollout throughput + fused-vs-scan agreement.

The extensibility proof measured on hardware: a declarative env added with
no kernel code rides the generic fused Pallas kernel at full speed.
Chained-marginal methodology (see BENCHMARKS.md): each link consumes the
previous final state, the timed region ends at a reduced-scalar fetch.
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

B, T, K = 65536, 8192, 4
env = excenvs.VanDerPol(batch_size=B, solver="tsit5", static_params={"mu": 5.0})
assert rollout_path(env) == "fused"
_, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B))
acts = jax.random.uniform(jax.random.PRNGKey(1), (T, B, 1), minval=-0.3, maxval=0.3)


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
        a = acts * (1.0 + 1e-3 * rep)
        t0 = time.perf_counter()
        st = chain(s0, a)
        f = float(jnp.mean(st.physical_state.position))
        assert jnp.isfinite(f)
        best = min(best, time.perf_counter() - t0)
    return best


t1 = chain_time(1)
tk = chain_time(K)
marg = (tk - t1) / (K - 1)
ok = (tk - t1) > 0.3 * t1
val = B * T / marg if ok and marg > 0 else B * T * K / tk

# agreement vs the scan path on a short horizon (device f32)
a16 = acts[:16]
obs_f, last_f = env_fused_rollout(env, s0, a16, time_major=True)
obs_s, last_s = env.vmap_rollout(s0, jnp.transpose(a16, (1, 0, 2)), 16)
dev = float(jnp.max(jnp.abs(obs_f - obs_s[:, -1])))

print(json.dumps({
    "metric": "van_der_pol_b65536_tsit5_pallas_fused",
    "value": val, "unit": "env-steps/s",
    "t1": t1, "tk": tk, "scaling_ok": ok,
    "fused_vs_scan_max_abs_dev_16steps": dev,
}), flush=True)
print("VAN DER POL DEVICE DONE", flush=True)
