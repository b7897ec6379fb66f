"""Device: the FOC law INSIDE the fused kernel (full-state feedback).

`make_foc_tile` packages the rotor-flux-oriented law — orientation, cascaded
flux/current PI with decoupling feedforward and back-calculation anti-windup,
voltage-vector limiting — as a stateful tile policy: the four carry planes
(PI integrators + anti-windup flag) ride VMEM, the InductionMachine steps on
the generic fused kernel, and the whole drive control loop runs at kernel
throughput.  The sensorless composition (`foc_device.py`) is the same law at
~1.2e6 law+plant+EKF triples/s — the observer IS that loop's cost; this
measures the law+plant pair alone, for studies that may read the true state
(tuning sweeps, feasibility scans, dataset generation under a drive law).

Chained-marginal timing per the relay methodology; control quality asserted
on the final state (flux/torque at their setpoints from a cold start).
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
from exciting_environments_tpu.ops.pallas.stepper import env_fused_closed_loop
from exciting_environments_tpu.utils import foc

B, T, K = 65536, 4096, 4
PSI_REF, TORQUE_REF = 0.7, 8.0

env = excenvs.InductionMachine(batch_size=B)
policy_tile, carry0 = foc.make_foc_tile(env, psi_ref=PSI_REF, torque_ref=TORQUE_REF)
_, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B))
with structures.copy_and_mutate(s0, validate=False) as s0:
    s0.physical_state.i_sd = jnp.zeros(B)
    s0.physical_state.i_sq = jnp.zeros(B)
    s0.physical_state.psi_rd = jnp.zeros(B)
    s0.physical_state.psi_rq = jnp.zeros(B)


def chain_time(k):
    e = excenvs.InductionMachine(batch_size=B)
    tile, c0 = foc.make_foc_tile(e, psi_ref=PSI_REF, torque_ref=TORQUE_REF)

    @jax.jit
    def chain(state):
        c = c0
        for _ in range(k):
            _, state, c = env_fused_closed_loop(e, state, tile, T, policy_carry=c)
        return state, c

    out = chain(s0)
    jax.block_until_ready(out)
    best, last = 1e9, None
    for rep in (1, 2):
        st = structures.replace(
            s0,
            physical_state=structures.replace(
                s0.physical_state, psi_rd=jnp.full((B,), 1e-6 * rep)
            ),
        )
        t0 = time.perf_counter()
        st, c = chain(st)
        fence = float(jnp.mean(st.physical_state.psi_rd)) + float(jnp.mean(c[2]))
        assert jnp.isfinite(fence)
        best = min(best, time.perf_counter() - t0)
        last = st
    return best, last


t1, _ = chain_time(1)
tk, last = chain_time(K)
marg = (tk - t1) / (K - 1)
ok = (tk - t1) > 0.3 * t1
val = B * T / marg if ok and marg > 0 else B * T * K / tk

# control quality after K*T steps (1.6 s of drive time) from a cold start
phys = last.physical_state
psi = jnp.hypot(phys.psi_rd, phys.psi_rq)
tq = env.torque(last)
psi_err = float(jnp.max(jnp.abs(psi - PSI_REF)))
tq_err = float(jnp.max(jnp.abs(tq - TORQUE_REF)))
print(f"fleet max |psi-{PSI_REF}|={psi_err:.4f}, max |T-{TORQUE_REF}|={tq_err:.4f}", flush=True)
assert psi_err < 0.05 and tq_err < 0.8

print(json.dumps({
    "metric": "scim_foc_in_kernel_steps_per_s", "value": val,
    "t1": t1, "tk": tk, "scaling_ok": ok,
    "config": f"b{B}_T{T}_full_state_foc_tile_psi{PSI_REF}_T{TORQUE_REF}",
    "fleet_max_abs_psi_err": psi_err, "fleet_max_abs_torque_err": tq_err,
}), flush=True)
print("FOC IN-KERNEL DEVICE DONE", flush=True)
