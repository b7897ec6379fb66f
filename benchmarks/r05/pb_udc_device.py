"""Round-5 device rows: per-batch ``u_dc`` (+ bands) in full PMSM kernel
scope (r4 VERDICT item 2).

Rows (eager-chain methodology per CLAUDE.md):

1. ``pmsm_pb_udc_rollout_steps_per_s`` — u_dc+r_s-randomized saturated
   fleet through the OPEN-LOOP drive kernel (constraint pre-pass
   broadcasting the (B,) u_dc), parity-gated vs the scan on a short
   horizon.
2. ``pmsm_pb_udc_closed_loop_steps_per_s`` — the same fleet through the
   CLOSED-LOOP kernel (u_dc as a constraint tile plane), parity-gated.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.ops.pallas import rollout_path
from exciting_environments_tpu.ops.pallas.pmsm_stepper import (
    pmsm_fused_closed_loop,
    pmsm_fused_rollout,
    supports_pmsm_fused_closed_loop,
)
from exciting_environments_tpu.utils import randomize
from exciting_environments_tpu.utils.collect import tile_policy_scan

B, T, K = 65536, 2048, 6


def row(**kw):
    print(json.dumps(kw), flush=True)


fleet = randomize.randomize_env(
    excenvs.PMSM, jax.random.PRNGKey(3),
    {"u_dc": randomize.Uniform(350.0, 450.0), "r_s": randomize.Uniform(15e-3, 21e-3)},
    batch_size=B,
    defaults=dict(excenvs.MotorVariant.BRUSA.get_params().static_params.__dict__),
    saturated=True, motor_variant=excenvs.MotorVariant.BRUSA,
)
assert rollout_path(fleet) == "pmsm_fused"
assert supports_pmsm_fused_closed_loop(fleet)

from exciting_environments_tpu.core import structures


def mk(seed):
    st = fleet.vmap_reset(jax.random.split(jax.random.PRNGKey(seed), B))[1]
    # pin the electrical speed mid-band (the r4 recipe): top-band resets
    # make the constant-voltage Euler loop genuinely unstable (~30%/step
    # growth), where ulp seeds amplify to O(100 A) and no per-instance
    # closeness gate is meaningful
    with structures.copy_and_mutate(st, validate=True) as st:
        st.physical_state.omega_el = jnp.full(B, 1200.0)
    return st


states = [mk(1), mk(2), mk(3)]
acts = [
    jax.random.uniform(jax.random.PRNGKey(40 + i), (B, T, 2), minval=-0.5, maxval=0.5)
    for i in range(3)
]

# parity gate on a short horizon (relative: CPU-FMA-style envelope does not
# apply on device — the saturated open-loop path is bitwise there)
a_eq = acts[0][:, :64]
_, l_ref = fleet.vmap_rollout(states[0], a_eq, 64)
_, l_fus = pmsm_fused_rollout(fleet, states[0], a_eq)
dev = max(
    float(jnp.max(jnp.abs(getattr(l_ref.physical_state, n) - getattr(l_fus.physical_state, n))))
    for n in ("i_d", "i_q", "torque", "u_d_buffer", "u_q_buffer", "epsilon")
)
row(metric="pmsm_pb_udc_rollout_parity_dev", value=dev,
    unit="max_abs_state_dev_T64", bitexact=dev == 0.0)
if dev > 1e-6:
    raise RuntimeError(f"per-batch u_dc open-loop parity broke: {dev}")


def link_ol(st, a):
    return pmsm_fused_rollout(fleet, st, a)[1]


l = link_ol(states[0], acts[0])
float(jnp.mean(l.physical_state.i_d))
best = float("inf")
for st0 in states[1:]:
    t0 = time.perf_counter()
    st = st0
    for i in range(K):
        st = link_ol(st, acts[i % len(acts)])
    fence = float(jnp.mean(st.physical_state.i_d))
    el = time.perf_counter() - t0
    assert np.isfinite(fence)
    best = min(best, el)
row(metric="pmsm_pb_udc_rollout_steps_per_s", value=B * T / (best / K),
    unit="env-steps/s", t_link=best / K,
    config=f"b{B}_T{T}_saturated_udc+rs_randomized")


# closed loop: state-dependent commands kept INSIDE the hexagon's inscribed
# circle (|u| ~ 0.46 of the band << u_dc/sqrt(3) even at u_dc = 350 V) so
# the sector clip stays inactive — with the clip ACTIVE a 1-ulp backend
# angle difference can flip the sector bit for an O(1) branch discontinuity
# per instance (a genuine measure-zero divergence between two equally valid
# float programs, observed 768 A max dev over 64 railed steps at b=65536),
# which no per-instance closeness gate can bound.  Inside the circle the
# loop contracts ulp differences like the sensorless tile's (T=1 bitwise,
# envelope-gated beyond).
def policy(obs, t):
    return (0.3 + 0.05 * obs[0] - 0.05 * obs[3], 0.25 + 0.05 * obs[1])


# parity structure on device: T=1 BITWISE (hard gate — the whole
# single-step path incl. the per-batch constraint planes is exact).  At
# T=16 the distribution is characterized, not per-instance-gated: the
# in-kernel constraint (explicit rotations + Mosaic trig) matches the
# scan's (dots + XLA trig) bitwise for ~99%/step of inputs; a ~1%/step
# ulp-seed rate accumulates to ~14% of instances deviating >1 mA by
# T=16 (median exactly 0.0 — the majority remains bitwise), and the
# non-stabilizing probe policy lets the stiff dynamics grow the seeded
# tail to ~7 A.  This is the r3-documented closeness contract for the
# closed loop; the STABILIZING in-kernel loop (the sensorless tile,
# saturated_sensorless_device.py) hard-gates its envelope — deviations
# contract there (median 3.8e-5 A at T=64).
devs_cl = {}
for Tp in (1, 16):
    o_k, l_k = pmsm_fused_closed_loop(fleet, states[0], policy, Tp)
    o_s, l_s = tile_policy_scan(fleet, states[0], Tp, policy, None, False)
    d_id = jnp.abs(l_k.physical_state.i_d - l_s.physical_state.i_d)
    devs_cl[Tp] = max(
        float(jnp.max(jnp.abs(getattr(l_k.physical_state, n) - getattr(l_s.physical_state, n))))
        for n in ("i_d", "i_q", "torque")
    )
    med_cl = float(jnp.median(d_id))
    frac_dev = float(jnp.mean((d_id > 1e-3).astype(jnp.float32)))
row(metric="pmsm_pb_udc_closed_loop_parity_dev", value=devs_cl[16],
    unit="max_abs_state_dev_T16", dev_T1_bitwise=devs_cl[1],
    median_abs_dev_i_d_T16=med_cl, frac_instances_dev_over_1mA=frac_dev)
if devs_cl[1] != 0.0:
    raise RuntimeError(f"single-step per-batch-u_dc closed loop not bitwise: {devs_cl[1]}")
if med_cl != 0.0 or devs_cl[16] > 100.0:
    raise RuntimeError(
        f"per-batch u_dc closed-loop parity characterization broke: median "
        f"{med_cl} (must stay bitwise), tail {devs_cl[16]}"
    )
# the per-batch normalization planes must genuinely differ across the fleet
assert float(jnp.std(jnp.asarray(fleet.env_properties.static_params.u_dc))) > 10.0


def link_cl(st):
    _, last = pmsm_fused_closed_loop(fleet, st, policy, T)
    return last


l = link_cl(states[0])
float(jnp.mean(l.physical_state.i_d))
best = float("inf")
for st0 in states[1:]:
    t0 = time.perf_counter()
    st = st0
    for _ in range(K):
        st = link_cl(st)
    fence = float(jnp.mean(st.physical_state.i_d))
    el = time.perf_counter() - t0
    assert np.isfinite(fence)
    best = min(best, el)
row(metric="pmsm_pb_udc_closed_loop_steps_per_s", value=B * T / (best / K),
    unit="policy+constraint+plant steps/s", t_link=best / K,
    config=f"b{B}_T{T}_saturated_udc+rs_randomized_closed_loop")
