"""Device: STATEFUL policy-in-kernel closed loop (pendulum PI tracking).

Same chained-marginal harness as ``closed_loop_device.py``, but the policy
carries a per-instance integrator between steps (``policy_carry``): the PI
law's state rides a VMEM plane exactly like the integration state — no HBM
traffic for either the actions or the controller state.  The interesting
number is the DELTA vs the stateless PD loop: the carry costs one extra
VMEM plane and a handful of elementwise ops per step.
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import exciting_environments_tpu as excenvs
from exciting_environments_tpu.core import structures
from exciting_environments_tpu.ops.pallas.stepper import env_fused_closed_loop

B, T, K = 65536, 4096, 4
env = excenvs.Pendulum(batch_size=B, control_state=["theta"])
_, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B))
s0 = structures.replace(s0, reference=structures.replace(s0.reference, theta=jnp.linspace(-1.5, 1.5, B)))


def policy_tile(obs, t, carry):
    e = obs[2] - obs[0]
    integ = carry[0] + 2e-3 * e
    return (jnp.clip(0.9 * e + integ - 0.25 * obs[1], -1.0, 1.0),), (integ,)


def chain_time(k):
    e = excenvs.Pendulum(batch_size=B, control_state=["theta"])

    @jax.jit
    def chain(state, c):
        for _ in range(k):
            _, state, c = env_fused_closed_loop(
                e, state, policy_tile, T, policy_carry=c
            )
        return state, c

    c0 = (jnp.zeros(B),)
    out = chain(s0, c0)
    jax.block_until_ready(out)
    best = 1e9
    for rep in (1, 2):
        st = structures.replace(
            s0, physical_state=structures.replace(
                s0.physical_state, omega=s0.physical_state.omega * (1.0 + 1e-3 * rep)))
        t0 = time.perf_counter()
        st, c = chain(st, c0)
        f = float(jnp.mean(st.physical_state.theta)) + float(jnp.mean(c[0]))
        assert jnp.isfinite(f)
        best = min(best, time.perf_counter() - t0)
    return best


t1 = chain_time(1)
tk = chain_time(K)
marg = (tk - t1) / (K - 1)
ok = (tk - t1) > 0.3 * t1
val = B * T / marg if ok and marg > 0 else B * T * K / tk
print(json.dumps({"metric": "pendulum_stateful_closed_loop_in_kernel_steps_per_s", "value": val,
                  "t1": t1, "tk": tk, "scaling_ok": ok,
                  "config": "b65536_T4096_PI_policy_with_VMEM_carry"}), flush=True)
print("STATEFUL CLOSED LOOP DEVICE DONE", flush=True)
