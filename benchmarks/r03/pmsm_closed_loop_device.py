"""Device: policy-in-kernel closed-loop PMSM drive throughput.

Saturated BRUSA magnetics (exact int8x4 LUT gather), PI-style current
controller evaluated inside the fused drive kernel every step.  Chained-
marginal timing per the relay methodology (fetch fences, scaling gate).
"""
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.core import structures
from exciting_environments_tpu.ops.pallas.pmsm_stepper import pmsm_fused_closed_loop

B, T, K = 8192, 2048, 4


def make_env():
    return excenvs.PMSM(
        batch_size=B, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA,
        control_state=["i_d", "i_q"],
    )


env = make_env()
_, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B))
s0 = structures.replace(
    s0,
    reference=structures.replace(
        s0.reference,
        i_d=jnp.linspace(-200.0, -10.0, B, dtype=jnp.float32),
        i_q=jnp.linspace(-150.0, 150.0, B, dtype=jnp.float32),
    ),
)


def policy_tile(obs, t):
    return (-0.6 * (obs[0] - obs[8]), -0.6 * (obs[1] - obs[9]))


def chain_time(k):
    e = make_env()

    @jax.jit
    def chain(state):
        for _ in range(k):
            _, state = pmsm_fused_closed_loop(e, state, policy_tile, T, gather="int8")
        return state

    out = chain(s0)
    jax.block_until_ready(out)
    best = 1e9
    for rep in (1, 2):
        st = structures.replace(
            s0,
            physical_state=structures.replace(
                s0.physical_state,
                i_d=s0.physical_state.i_d * (1.0 + 1e-3 * rep),
            ),
        )
        t0 = time.perf_counter()
        st = chain(st)
        f = float(jnp.mean(st.physical_state.i_d))
        assert jnp.isfinite(f)
        best = min(best, time.perf_counter() - t0)
    return best


t1 = chain_time(1)
tk = chain_time(K)
marg = (tk - t1) / (K - 1)
ok = (tk - t1) > 0.3 * t1
val = B * T / marg if ok and marg > 0 else B * T * K / tk
print(json.dumps({
    "metric": "pmsm_closed_loop_in_kernel_steps_per_s", "value": val,
    "t1": t1, "tk": tk, "scaling_ok": ok,
}), flush=True)
print("PMSM CLOSED LOOP DEVICE DONE", flush=True)
