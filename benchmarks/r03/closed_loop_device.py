"""Device: policy-in-kernel closed loop throughput (pendulum PD tracking)."""
import json, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import exciting_environments_tpu as excenvs
from exciting_environments_tpu.core import structures
from exciting_environments_tpu.ops.pallas.stepper import env_fused_closed_loop

B, T, K = 65536, 4096, 4
env = excenvs.Pendulum(batch_size=B, control_state=["theta"])
_, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B))
s0 = structures.replace(s0, reference=structures.replace(s0.reference, theta=jnp.linspace(-1.5, 1.5, B)))

def policy_tile(obs, t):
    return (-0.9 * (obs[0] - obs[2]) - 0.25 * obs[1],)

def chain_time(k):
    e = excenvs.Pendulum(batch_size=B, control_state=["theta"])
    @jax.jit
    def chain(state):
        for _ in range(k):
            _, state = env_fused_closed_loop(e, state, policy_tile, T)
        return state
    out = chain(s0); jax.block_until_ready(out)
    best = 1e9
    for rep in (1, 2):
        st = structures.replace(
            s0, physical_state=structures.replace(
                s0.physical_state, omega=s0.physical_state.omega * (1.0 + 1e-3 * rep)))
        t0 = time.perf_counter()
        st = chain(st)
        f = float(jnp.mean(st.physical_state.theta))
        assert jnp.isfinite(f)
        best = min(best, time.perf_counter() - t0)
    return best

t1 = chain_time(1)
tk = chain_time(K)
marg = (tk - t1) / (K - 1)
ok = (tk - t1) > 0.3 * t1
val = B * T / marg if ok and marg > 0 else B * T * K / tk
print(json.dumps({"metric": "pendulum_closed_loop_in_kernel_steps_per_s", "value": val,
                  "t1": t1, "tk": tk, "scaling_ok": ok}), flush=True)
print("CLOSED LOOP DEVICE DONE", flush=True)
