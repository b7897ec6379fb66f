"""Device: trig-free fast PMSM kernel, LINEAR magnetics.

No LUT gather and no XLA constraint pre-pass (linear sector tests +
rotation carry in-kernel): the arithmetic-bound ceiling of the open-loop
drive.  The exact open-loop linear path (1.42e9) pays the XLA pre-pass;
this shows what streaming raw actions into an all-in-kernel step buys.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.ops.pallas.pmsm_fast_kernel import pmsm_fast_fused_rollout

B, T, K = 65536, 2048, 4
env = excenvs.PMSM(batch_size=B, motor_variant=excenvs.MotorVariant.DEFAULT)
_, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B))
acts = [jax.random.uniform(jax.random.PRNGKey(30 + i), (B, T, 2), minval=-0.5, maxval=0.5)
        for i in range(K)]


def chain_time(k):
    e = excenvs.PMSM(batch_size=B, motor_variant=excenvs.MotorVariant.DEFAULT)

    @jax.jit
    def chain(state, aa):
        for i in range(k):
            state = pmsm_fast_fused_rollout(e, state, aa[i])
        return state

    aa = jnp.stack(acts[:k])
    out = chain(s0, aa)
    jax.block_until_ready(out)
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


t1 = chain_time(1)
tk = chain_time(K)
marg = (tk - t1) / (K - 1)
ok = (tk - t1) > 0.3 * t1
val = B * T / marg if ok and marg > 0 else B * T * K / tk
print(json.dumps({
    "metric": "pmsm_fast_kernel_linear_steps_per_s", "value": val,
    "t1": t1, "tk": tk, "scaling_ok": ok,
}), flush=True)
print("FAST LINEAR DONE", flush=True)
