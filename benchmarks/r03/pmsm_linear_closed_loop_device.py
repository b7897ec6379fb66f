"""Device: closed-loop LINEAR-magnetics PMSM drive throughput.

No LUT gather: the kernel is arithmetic-bound, so keeping the inverter
constraint + policy in VMEM (no action slab, no XLA pre-pass per link)
runs 5.5x the open-loop linear fused rollout.  Omega scaled into the
controllable region (high-|omega| envs are open-loop unstable under a
weak P law and reach inf over long horizons).
"""
import json, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import exciting_environments_tpu as excenvs
from exciting_environments_tpu.core import structures
from exciting_environments_tpu.ops.pallas.pmsm_stepper import pmsm_fused_closed_loop

B, T, K = 8192, 16384, 6
def make_env():
    return excenvs.PMSM(batch_size=B, motor_variant=excenvs.MotorVariant.DEFAULT,
                        control_state=["i_d", "i_q"])
env = make_env()
_, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B))
# keep the fleet inside the controllable region: high-|omega| envs are
# open-loop unstable under a weak P law and reach inf over 2048 steps
s0 = structures.replace(s0, physical_state=structures.replace(
    s0.physical_state, omega_el=s0.physical_state.omega_el * 0.2))
s0 = structures.replace(s0, reference=structures.replace(
    s0.reference, i_d=jnp.linspace(-200., -10., B, dtype=jnp.float32),
    i_q=jnp.linspace(-150., 150., B, dtype=jnp.float32)))
pol = lambda o, t: (-0.6 * (o[0] - o[8]), -0.6 * (o[1] - o[9]))

def chain_time(k):
    e = make_env()
    @jax.jit
    def chain(state):
        for _ in range(k):
            _, state = pmsm_fused_closed_loop(e, state, pol, T)
        return state
    out = chain(s0); jax.block_until_ready(out)
    best = 1e9
    for rep in (1, 2):
        st = structures.replace(s0, physical_state=structures.replace(
            s0.physical_state, i_d=s0.physical_state.i_d * (1.0 + 1e-3 * rep)))
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
print(json.dumps({"metric": "pmsm_linear_closed_loop_in_kernel_steps_per_s", "value": val,
                  "t1": t1, "tk": tk, "scaling_ok": ok}), flush=True)
