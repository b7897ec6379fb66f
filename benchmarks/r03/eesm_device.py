"""Device: EESM fused rollout + in-kernel dq/field PI current control.

The magnet-free traction drive measured on hardware: the declarative EESM
rides the generic fused Pallas kernel with no kernel code (3-action HBM
stream, 12 B/env-step), and ``make_eesm_current_tile`` closes all three
current loops INSIDE the kernel (three PI integrator carry planes on VMEM,
decoupling feedforward, voltage-vector limit).  Chained-marginal
methodology (see BENCHMARKS.md); inputs vary per repeat (relay cache).
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.core import structures
from exciting_environments_tpu.ops.pallas import rollout_path
from exciting_environments_tpu.ops.pallas.stepper import (
    env_fused_closed_loop,
    env_fused_rollout,
)
from exciting_environments_tpu.utils import foc

# --- open-loop fused rollout: 3-action slab, 12 B/env-step off HBM ---
B, T = 65536, 4096
K1, K2 = 2, 48  # one link ~4 ms (HBM-bound): span well past the dispatch constant
env = excenvs.EESM(batch_size=B)
assert rollout_path(env) == "fused"
_, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B))
acts = jax.random.uniform(jax.random.PRNGKey(1), (T, B, 3), minval=-0.3, maxval=0.3)


def chain_time(k):
    @jax.jit
    def chain(state, a):
        for _ in range(k):
            _, state = env_fused_rollout(env, state, a, time_major=True)
        return state

    out = chain(s0, acts)
    jax.block_until_ready(out)
    best = 1e9
    for rep in (1, 2):
        a = acts * (1.0 + 1e-3 * (rep + k))  # vary per repeat AND per k: relay caches args
        t0 = time.perf_counter()
        st = chain(s0, a)
        f = float(jnp.mean(st.physical_state.i_f))
        assert jnp.isfinite(f)
        best = min(best, time.perf_counter() - t0)
    return best


t1 = chain_time(K1)
tk = chain_time(K2)
marg = (tk - t1) / (K2 - K1)
ok = (tk - t1) > 0.3 * t1
val = B * T / marg if ok and marg > 0 else B * T * K2 / tk

# agreement vs the scan path on a short horizon (device f32)
a16 = acts[:16]
obs_f, last_f = env_fused_rollout(env, s0, a16, time_major=True)
obs_s, last_s = env.vmap_rollout(s0, jnp.transpose(a16, (1, 0, 2)), 16)
dev = float(jnp.max(jnp.abs(obs_f - obs_s[:, -1])))

print(json.dumps({
    "metric": "eesm_b65536_pallas_fused",
    "value": val, "unit": "env-steps/s",
    "t1": t1, "tk": tk, "scaling_ok": ok,
    "fused_vs_scan_max_abs_dev_16steps": dev,
}), flush=True)

# --- in-kernel PI current control: zero HBM action traffic, 3 carry planes ---
BC, TC, KC = 65536, 4096, 16  # link ~7 ms: 16 links clear the ~80 ms dispatch constant
cenv = excenvs.EESM(batch_size=BC)
tile, carry0 = foc.make_eesm_current_tile(cenv, i_d_ref=2.0, i_q_ref=5.0, i_f_ref=4.0)
_, c0state = cenv.vmap_reset(jax.random.split(jax.random.PRNGKey(2), BC))


def cl_chain_time(k):
    e = excenvs.EESM(batch_size=BC)

    @jax.jit
    def chain(state, c):
        for _ in range(k):
            _, state, c = env_fused_closed_loop(e, state, tile, TC, policy_carry=c)
        return state, c

    out = chain(c0state, carry0)
    jax.block_until_ready(out)
    best = 1e9
    for rep in (1, 2):
        st = structures.replace(
            c0state,
            physical_state=structures.replace(
                c0state.physical_state,
                i_d=c0state.physical_state.i_d + 1e-3 * rep,
            ),
        )
        t0 = time.perf_counter()
        st, c = chain(st, carry0)
        f = float(jnp.mean(st.physical_state.i_f)) + float(jnp.mean(c[0]))
        assert jnp.isfinite(f)
        best = min(best, time.perf_counter() - t0)
    return best


tc1 = cl_chain_time(1)
tck = cl_chain_time(KC)
marg_c = (tck - tc1) / (KC - 1)
ok_c = (tck - tc1) > 0.3 * tc1
val_c = BC * TC / marg_c if ok_c and marg_c > 0 else BC * TC * KC / tck

# control quality at the end of one chained run: on-setpoint currents
_, stq, _ = env_fused_closed_loop(cenv, c0state, tile, TC, policy_carry=carry0)
i_err = float(
    jnp.max(
        jnp.stack(
            [
                jnp.abs(stq.physical_state.i_d - 2.0),
                jnp.abs(stq.physical_state.i_q - 5.0),
                jnp.abs(stq.physical_state.i_f - 4.0),
            ]
        )
    )
)

print(json.dumps({
    "metric": "eesm_closed_loop_in_kernel_steps_per_s",
    "value": val_c, "unit": "law+plant pairs/s",
    "t1": tc1, "tk": tck, "scaling_ok": ok_c,
    "max_current_err_at_T4096_A": i_err,
    "config": "b65536_T4096_dq_field_PI_3_carry_planes",
}), flush=True)
print("EESM DEVICE DONE", flush=True)
