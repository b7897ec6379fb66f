"""Device: STATEFUL policy-in-kernel closed-loop PMSM drive throughput.

Saturated BRUSA magnetics (exact int8x4 LUT gather) with a TRUE PI current
controller: the per-axis integrators ride VMEM planes between steps
(``policy_carry``), so the drive loop carries real controller state at
kernel speed — the configuration ``pmsm_closed_loop_device.py`` approximates
with a stateless P law.  Chained-marginal timing per the relay methodology.
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


def policy_tile(obs, t, carry):
    e_d = obs[8] - obs[0]
    e_q = obs[9] - obs[1]
    int_d = carry[0] + 0.01 * e_d
    int_q = carry[1] + 0.01 * e_q
    return (0.6 * e_d + int_d, 0.6 * e_q + int_q), (int_d, int_q)


def chain_time(k):
    e = make_env()
    c0 = (jnp.zeros(B, jnp.float32), jnp.zeros(B, jnp.float32))

    @jax.jit
    def chain(state):
        c = c0
        for _ in range(k):
            _, state, c = pmsm_fused_closed_loop(
                e, state, policy_tile, T, gather="int8", policy_carry=c
            )
        return state, c

    out = chain(s0)
    jax.block_until_ready(out)
    best = 1e9
    for rep in (1, 2):
        st = structures.replace(
            s0,
            physical_state=structures.replace(
                s0.physical_state, i_d=s0.physical_state.i_d + 0.1 * rep
            ),
        )
        t0 = time.perf_counter()
        st, c = chain(st)
        f = float(jnp.mean(st.physical_state.i_d)) + float(jnp.mean(c[0]))
        assert jnp.isfinite(f)
        best = min(best, time.perf_counter() - t0)
    return best


t1 = chain_time(1)
tk = chain_time(K)
marg = (tk - t1) / (K - 1)
ok = (tk - t1) > 0.3 * t1
val = B * T / marg if ok and marg > 0 else B * T * K / tk
print(json.dumps({
    "metric": "pmsm_stateful_closed_loop_in_kernel_steps_per_s", "value": val,
    "t1": t1, "tk": tk, "scaling_ok": ok,
    "config": "b8192_T2048_saturated_brusa_int8_true_PI_with_VMEM_carry",
}), flush=True)
print("PMSM STATEFUL CLOSED LOOP DEVICE DONE", flush=True)
