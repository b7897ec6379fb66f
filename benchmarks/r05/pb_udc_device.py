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

mk = lambda s: fleet.vmap_reset(jax.random.split(jax.random.PRNGKey(s), B))[1]
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


# closed loop: a PI-flavored tile with enough state dependence to be real
def policy(obs, t):
    return (0.8 + 0.1 * obs[0] - 0.2 * obs[3], 0.7 + 0.1 * obs[1] - 0.1 * obs[3])


o_k, l_k = pmsm_fused_closed_loop(fleet, states[0], policy, 64)
o_s, l_s = tile_policy_scan(fleet, states[0], 64, policy, None, False)
dev_cl = max(
    float(jnp.max(jnp.abs(getattr(l_k.physical_state, n) - getattr(l_s.physical_state, n))))
    for n in ("i_d", "i_q", "torque")
)
row(metric="pmsm_pb_udc_closed_loop_parity_dev", value=dev_cl,
    unit="max_abs_state_dev_T64")
if dev_cl > 1e-2:
    raise RuntimeError(f"per-batch u_dc closed-loop parity broke: {dev_cl}")
# the randomized DC link must genuinely bind differently across the fleet
assert float(jnp.std(l_k.physical_state.u_d_buffer)) > 1.0


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
