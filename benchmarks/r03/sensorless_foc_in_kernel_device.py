"""Device: TRUE sensorless FOC fully inside the fused closed-loop kernel.

The capstone measured end-to-end: a stochastic InductionMachine fleet (noisy
current sensors streamed into the kernel as pre-scaled draw slabs), the
stationary-Kalman flux observer (`utils.estimate.stationary_kalman_gain` —
the SCIM at frozen speed is LTI, so the EKF's Riccati recursion collapses to
ONE constant gain) and the rotor-flux-oriented law all running as one
stateful tile policy on VMEM carry planes: measure -> assimilate -> orient ->
cascade PI -> limit -> step, zero host dispatches, zero HBM action traffic
(only the sensor-noise slab streams at 4 B/env-step).

The host-EKF composition (`foc_device.py`: law + plant + per-step 4-state
EKF through run_output_feedback_controller) runs the SAME control structure
at ~1.2e6 triples/s; this path replaces the per-step Riccati update with the
converged constant gain and keeps everything on-chip.

Chained-marginal timing per the relay methodology; control quality asserted
on the final state (flux/torque on setpoints the drive never directly
measures, from a cold start, under 0.3 A-rms sensor noise).
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
NOISE = {"i_sd": 0.3, "i_sq": 0.3}
NOISE_MODE = os.environ.get("NOISE_MODE", "exact")


def make(seed):
    plant = excenvs.InductionMachine(
        batch_size=B, observation_noise=NOISE, noise_mode=NOISE_MODE
    )
    tile, c0 = foc.make_sensorless_foc_tile(
        plant, psi_ref=PSI_REF, torque_ref=TORQUE_REF
    )
    _, s0 = plant.vmap_reset(jax.random.split(jax.random.PRNGKey(seed), B))
    with structures.copy_and_mutate(s0, validate=False) as s0:
        s0.physical_state.i_sd = jnp.zeros(B)
        s0.physical_state.i_sq = jnp.zeros(B)
        s0.physical_state.psi_rd = jnp.zeros(B)
        s0.physical_state.psi_rq = jnp.zeros(B)
    return plant, tile, c0, s0


plant, tile, carry0, s0 = make(0)


def chain_time(k):
    e, tl, c0, _ = make(0)

    @jax.jit
    def chain(state):
        c = c0
        for _ in range(k):
            _, state, c = env_fused_closed_loop(e, state, tl, T, policy_carry=c)
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

# control quality after K*T steps (1.6 s of drive time) from a cold start,
# on state the controller NEVER measured directly
phys = last.physical_state
psi = jnp.hypot(phys.psi_rd, phys.psi_rq)
tq = plant.torque(last)
psi_err = float(jnp.max(jnp.abs(psi - PSI_REF)))
tq_err = float(jnp.max(jnp.abs(tq - TORQUE_REF)))
print(f"fleet max |psi-{PSI_REF}|={psi_err:.4f}, max |T-{TORQUE_REF}|={tq_err:.4f}", flush=True)
assert psi_err < 0.05 and tq_err < 1.2

suffix = "" if NOISE_MODE == "exact" else f"_{NOISE_MODE}"
print(json.dumps({
    "metric": f"scim_sensorless_foc_in_kernel_steps_per_s{suffix}", "value": val,
    "t1": t1, "tk": tk, "scaling_ok": ok,
    "config": f"b{B}_T{T}_stationary_kalman_plus_foc_tile_noisy_sensors_{NOISE_MODE}_psi{PSI_REF}_T{TORQUE_REF}",
    "fleet_max_abs_psi_err": psi_err, "fleet_max_abs_torque_err": tq_err,
}), flush=True)
print("SENSORLESS FOC IN-KERNEL DEVICE DONE", flush=True)
