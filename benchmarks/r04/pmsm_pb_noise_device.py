"""Device: the round-4 PMSM kernel scope extensions measured on hardware.

1. Domain-randomized SATURATED drive fleet (per-batch r_s) through the
   fused kernel — the configuration that fell 27x to the scan in round 3
   (`BENCHMARKS_r03.json`: 1.19e7 scan vs 3.2e8 fused).  Gates: bit-exact
   vs the scan over 64 steps (the per-batch planes must not perturb the
   exact arithmetic), then chained-marginal throughput.
2. Stochastic saturated drive (current process noise + current/torque
   sensor noise) through the fused kernel, exact and fast draw modes —
   round 3 ran these at scan speed.
3. Sensorless current control fully in-kernel for the linear drive
   (stationary-Kalman observer + PI on the belief as a stateful tile
   policy) — the PMSM counterpart of the SCIM's 9.6e8 steps/s sensorless
   loop; round 3's only PMSM output-feedback path was the 234 Hz host-EKF
   fleet.

Chained-marginal methodology with per-repeat input variation throughout
(see BENCHMARKS.md)."""
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
from exciting_environments_tpu.ops.pallas.pmsm_stepper import (
    pmsm_fused_closed_loop,
    pmsm_fused_rollout,
)
from exciting_environments_tpu.utils import foc, randomize

STATE_FIELDS = ("i_d", "i_q", "torque", "epsilon", "u_d_buffer", "u_q_buffer")


def max_dev(a, b):
    return max(
        float(jnp.max(jnp.abs(getattr(a.physical_state, n) - getattr(b.physical_state, n))))
        for n in STATE_FIELDS
    )


# ---- 1. per-batch randomized saturated fleet --------------------------------
B, T, K = 65536, 512, 6
defaults = dict(excenvs.MotorVariant.BRUSA.get_params().static_params.__dict__)
env = randomize.randomize_env(
    excenvs.PMSM, jax.random.PRNGKey(3),
    {"r_s": randomize.Uniform(15e-3, 21e-3)},
    batch_size=B, defaults=defaults, saturated=True,
    motor_variant=excenvs.MotorVariant.BRUSA,
)
assert rollout_path(env) == "pmsm_fused", rollout_path(env)
_, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B))
acts = [
    jax.random.uniform(jax.random.PRNGKey(10 + i), (B, T, 2), minval=-0.5, maxval=0.5)
    for i in range(K)
]

# bit-exactness vs the scan over 64 steps (per-batch tile operands included)
a64 = acts[0][:, :64]
obs_s, last_s = env.vmap_rollout(s0, a64, 64)
obs_f, last_f = pmsm_fused_rollout(env, s0, a64, gather="int8")
dev = max_dev(last_f, last_s)
print(json.dumps({
    "metric": "pmsm_randomized_fleet_fused_vs_scan_max_abs_dev", "value": dev,
    "config": "b65536_T64_saturated_BRUSA_per_batch_r_s",
}), flush=True)


def chain_time_openloop(e, state0, act_list, k):
    @jax.jit
    def chain(state, aa):
        for i in range(k):
            _, state = pmsm_fused_rollout(e, state, aa[i], gather="int8")
        return state

    aa = jnp.stack(act_list[:k])
    out = chain(state0, aa)
    jax.block_until_ready(out)
    best = 1e9
    for rep in (1, 2):
        scaled = aa * (1.0 + 1e-3 * (rep + k))
        t0 = time.perf_counter()
        out = chain(state0, scaled)
        assert jnp.isfinite(float(jnp.mean(out.physical_state.i_d)))
        best = min(best, time.perf_counter() - t0)
    return best


t1 = chain_time_openloop(env, s0, acts, 1)
tk = chain_time_openloop(env, s0, acts, K)
marg = (tk - t1) / (K - 1)
ok = (tk - t1) > 0.3 * t1
val = B * T / marg if ok and marg > 0 else B * T * K / tk
print(json.dumps({
    "metric": "pmsm_randomized_fleet_fused_steps_per_s", "value": val,
    "unit": "env-steps/s", "t1": t1, "tk": tk, "scaling_ok": ok,
    "config": "b65536_T512_saturated_per_batch_r_s_int8_gather",
}), flush=True)

# scan comparison (the round-3 cliff): one short chained scan measurement
Tscan = 64


def chain_time_scan(k):
    @jax.jit
    def chain(state, aa):
        for i in range(k):
            _, state = env.vmap_rollout(state, aa[i], Tscan)
        return state

    aa = jnp.stack([a[:, :Tscan] for a in acts[:k]])
    out = chain(s0, aa)
    jax.block_until_ready(out)
    best = 1e9
    for rep in (1, 2):
        scaled = aa * (1.0 + 1e-3 * (rep + k))
        t0 = time.perf_counter()
        out = chain(s0, scaled)
        assert jnp.isfinite(float(jnp.mean(out.physical_state.i_d)))
        best = min(best, time.perf_counter() - t0)
    return best


ts1 = chain_time_scan(1)
tsk = chain_time_scan(4)
marg_s = (tsk - ts1) / 3
ok_s = (tsk - ts1) > 0.3 * ts1
val_s = B * Tscan / marg_s if ok_s and marg_s > 0 else B * Tscan * 4 / tsk
print(json.dumps({
    "metric": "pmsm_randomized_fleet_scan_steps_per_s", "value": val_s,
    "unit": "env-steps/s", "t1": ts1, "tk": tsk, "scaling_ok": ok_s,
    "speedup_fused_over_scan": val / val_s,
}), flush=True)

# ---- 2. stochastic saturated drive, both draw modes -------------------------
for mode in ("exact", "fast"):
    senv = excenvs.PMSM(
        batch_size=B, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA,
        process_noise={"i_d": 0.5, "i_q": 0.5},
        observation_noise={"i_d": 0.5, "i_q": 0.5, "torque": 1.0},
        noise_mode=mode,
    )
    assert rollout_path(senv) == "pmsm_fused"
    _, ss0 = senv.vmap_reset(jax.random.split(jax.random.PRNGKey(1), B))

    # draw parity vs the scan on a short horizon (device f32 closeness)
    obs_ss, last_ss = senv.vmap_rollout(ss0, a64, 64)
    obs_sf, last_sf = pmsm_fused_rollout(senv, ss0, a64, gather="int8")
    sdev = max_dev(last_sf, last_ss)
    keys_eq = bool(jnp.array_equal(jnp.asarray(last_sf.PRNGKey), jnp.asarray(last_ss.PRNGKey)))

    st1 = chain_time_openloop(senv, ss0, acts, 1)
    stk = chain_time_openloop(senv, ss0, acts, K)
    smarg = (stk - st1) / (K - 1)
    sok = (stk - st1) > 0.3 * st1
    sval = B * T / smarg if sok and smarg > 0 else B * T * K / stk
    print(json.dumps({
        "metric": f"pmsm_stochastic_fused_steps_per_s_{mode}", "value": sval,
        "unit": "env-steps/s", "t1": st1, "tk": stk, "scaling_ok": sok,
        "fused_vs_scan_max_abs_dev_64steps": sdev, "final_keys_equal": keys_eq,
        "config": "b65536_T512_saturated_proc+sensor_noise",
    }), flush=True)

# ---- 3. sensorless current control in-kernel (linear drive) -----------------
BC, TC, KC = 65536, 4096, 8
OMEGA = 1200.0
# sensor noise only (the SCIM sensorless bench's configuration class):
# the observer's whole premise is reconstructing through noisy sensors
cenv = excenvs.PMSM(
    batch_size=BC, motor_variant=excenvs.MotorVariant.DEFAULT,
    observation_noise={"i_d": 5.0, "i_q": 5.0},
)
_, c0 = cenv.vmap_reset(jax.random.split(jax.random.PRNGKey(2), BC))
with structures.copy_and_mutate(c0, validate=True) as c0:
    c0.physical_state.omega_el = jnp.full(BC, OMEGA)
tile, carry0 = foc.make_pmsm_sensorless_current_tile(
    cenv, i_d_ref=-30.0, i_q_ref=60.0, omega_el=OMEGA
)


def chain_time_cl(k):
    e = excenvs.PMSM(
        batch_size=BC, motor_variant=excenvs.MotorVariant.DEFAULT,
        observation_noise={"i_d": 5.0, "i_q": 5.0},
    )

    @jax.jit
    def chain(state, c):
        for _ in range(k):
            _, state, c = pmsm_fused_closed_loop(e, state, tile, TC, policy_carry=c)
        return state, c

    out = chain(c0, carry0)
    jax.block_until_ready(out)
    best = 1e9
    for rep in (1, 2):
        st = structures.replace(
            c0,
            physical_state=structures.replace(
                c0.physical_state, i_d=c0.physical_state.i_d + 1e-3 * rep
            ),
        )
        t0 = time.perf_counter()
        stf, cf = chain(st, carry0)
        assert jnp.isfinite(float(jnp.mean(stf.physical_state.i_d)) + float(jnp.mean(cf[0])))
        best = min(best, time.perf_counter() - t0)
    return best


tc1 = chain_time_cl(1)
tck = chain_time_cl(KC)
marg_c = (tck - tc1) / (KC - 1)
ok_c = (tck - tc1) > 0.3 * tc1
val_c = BC * TC / marg_c if ok_c and marg_c > 0 else BC * TC * KC / tck

# control quality: settle on the never-measured setpoints
_, stq, fcq = pmsm_fused_closed_loop(cenv, c0, tile, TC, policy_carry=carry0)
err_d = float(jnp.mean(jnp.abs(stq.physical_state.i_d + 30.0)))
err_q = float(jnp.mean(jnp.abs(stq.physical_state.i_q - 60.0)))
print(json.dumps({
    "metric": "pmsm_sensorless_in_kernel_steps_per_s", "value": val_c,
    "unit": "measure+assimilate+control+plant steps/s",
    "t1": tc1, "tk": tck, "scaling_ok": ok_c,
    "mean_abs_err_i_d_A": err_d, "mean_abs_err_i_q_A": err_q,
    "config": "b65536_T4096_linear_DEFAULT_noisy_current_sensors_stationary_kalman_PI_4_carry_planes",
}), flush=True)
print("PMSM R04 DEVICE DONE", flush=True)
