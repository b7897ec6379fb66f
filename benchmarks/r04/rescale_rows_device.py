"""Device: re-measure the 12 `chain_scaling_ok: false` rows of
`BENCHMARKS_r03.json` with horizons long enough to clear the relay's
latency floor (round-4 verdict item 6).

Every one of the 12 sat at t1 ~ tk ~ 0.06-0.09 s — the ~35-40 ms relay
round-trip plus fetch dominated, so the marginal was noise and the
committed value a whole-chain average.  Here each link carries 8-32x more
steps (target: t1 >= 0.5 s) and the chains are longer, so the marginal is
measured against a real workload.  Metric names carry the horizon
explicitly (`..._T16384`) so per-rollout rows can never be confused with
sustained-headline rows of a nominally identical config again.

Memory note: at these horizons a per-link action slab would OOM HBM
(8 x (16384, 65536, 1) f32 = 34 GB), so every link of a chain reuses ONE
slab — the links stay sequentially data-dependent through the state, and
inputs vary per repeat AND per chain length, which is what defeats the
relay's (executable, args) cache.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import exciting_environments_tpu as excenvs  # noqa: E402
from exciting_environments_tpu.core import structures  # noqa: E402
from exciting_environments_tpu.ops.pallas.stepper import env_fused_rollout  # noqa: E402


def chain_row(name, link_fn, state0, acts, n_steps_per_link, k1, k2, fence):
    """Chained-marginal timing with one shared action slab per chain."""

    def chain_time(k):
        @jax.jit
        def chain(state, a):
            for _ in range(k):
                state = link_fn(state, a)
            return state

        out = chain(state0, acts)
        jax.block_until_ready(out)
        best = 1e9
        for rep in (1, 2):
            a = acts * (1.0 + 1e-3 * (rep + k))
            t0 = time.perf_counter()
            st = chain(state0, a)
            assert jnp.isfinite(fence(st))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = chain_time(k1)
    tk = chain_time(k2)
    marg = (tk - t1) / (k2 - k1)
    ok = (tk - t1) > 0.3 * t1
    val = n_steps_per_link / marg if ok and marg > 0 else n_steps_per_link * k2 / tk
    print(json.dumps({
        "metric": name, "value": val, "unit": "env-steps/s",
        "methodology": "chained_marginal" if ok else "whole_chain_average",
        "chain_scaling_ok": ok, "seconds_single": t1, "seconds_chain": tk,
        "k_chain": k2,
    }), flush=True)
    return val


def mean_leaf(attr):
    return lambda st: float(jnp.mean(getattr(st.physical_state, attr)))


# ---- pendulum b=65536: scan / fused / fast-math, T=16384 -------------------
B, T = 65536, 16384
env = excenvs.Pendulum(batch_size=B, tau=1e-4)
_, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B))
acts_tm = jax.random.uniform(jax.random.PRNGKey(50), (T, B, 1), minval=-1, maxval=1)
chain_row(
    f"pendulum_b65536_vmap_rollout_T{T}",
    lambda st, a: env.vmap_rollout(st, jnp.swapaxes(a, 0, 1), T)[1],
    state, acts_tm, B * T, 1, 4, mean_leaf("theta"),
)
chain_row(
    f"pendulum_b65536_pallas_fused_T{T}",
    lambda st, a: env_fused_rollout(env, st, a, time_major=True)[1],
    state, acts_tm, B * T, 1, 8, mean_leaf("theta"),
)
from exciting_environments_tpu.ops.pallas.pendulum_fast import pendulum_fast_rollout  # noqa: E402


def fast_link(st, a):
    th, om = pendulum_fast_rollout(env, st, jnp.swapaxes(a, 0, 1))
    return structures.replace(st, physical_state=env.PhysicalState(theta=th, omega=om))


chain_row(
    f"pendulum_b65536_pallas_fast_math_T{T}",
    fast_link, state, acts_tm, B * T, 1, 8, mean_leaf("theta"),
)
del acts_tm

# ---- msd b=16384 scan + fused, T=16384 -------------------------------------
B2, T2 = 16384, 16384
env2 = excenvs.MassSpringDamper(batch_size=B2)
_, state2 = env2.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B2))
acts2 = jax.random.uniform(jax.random.PRNGKey(10), (T2, B2, 1), minval=-1, maxval=1)
chain_row(
    f"msd_b16384_vmap_rollout_T{T2}",
    lambda st, a: env2.vmap_rollout(st, jnp.swapaxes(a, 0, 1), T2)[1],
    state2, acts2, B2 * T2, 1, 6, mean_leaf("deflection"),
)
chain_row(
    f"msd_b16384_pallas_fused_T{T2}",
    lambda st, a: env_fused_rollout(env2, st, a, time_major=True)[1],
    state2, acts2, B2 * T2, 1, 8, mean_leaf("deflection"),
)
del acts2

# ---- cartpole / acrobot tsit5 vmap_sim_ahead b=4096, T=4096 ----------------
for cls, name in [(excenvs.CartPole, "cartpole"), (excenvs.Acrobot, "acrobot")]:
    B3, T3 = 4096, 4096
    env3 = cls(batch_size=B3, solver="tsit5")
    _, state3 = env3.vmap_reset()
    acts3 = jax.random.uniform(
        jax.random.PRNGKey(20), (B3, T3, env3.action_dim), minval=-0.5, maxval=0.5
    )
    fence3 = (
        mean_leaf("deflection") if name == "cartpole" else mean_leaf("theta_1")
    )
    chain_row(
        f"{name}_b4096_tsit5_sim_ahead_T{T3}",
        lambda st, a, env3=env3: env3.vmap_sim_ahead(st, a, env3.tau, env3.tau)[2],
        state3, acts3, B3 * T3, 1, 4, fence3,
    )

# ---- pmsm linear fast-math b=65536, T=8192 ---------------------------------
from exciting_environments_tpu.ops.pmsm_fast import pmsm_fast_rollout  # noqa: E402

B4, T4 = 65536, 8192
env4 = excenvs.PMSM(batch_size=B4, motor_variant=excenvs.MotorVariant.DEFAULT)
_, state4 = env4.vmap_reset(jax.random.split(jax.random.PRNGKey(3), B4))
acts4 = jax.random.uniform(jax.random.PRNGKey(40), (B4, T4, 2), minval=-0.3, maxval=0.3)
chain_row(
    f"pmsm_linear_b65536_fast_math_T{T4}",
    lambda st, a: pmsm_fast_rollout(env4, st, a),
    state4, acts4, B4 * T4, 1, 6, mean_leaf("i_d"),
)
del acts4

# ---- cartpole / acrobot fused b=65536, exact + fast-math, T=8192 -----------
for cls, name in [(excenvs.CartPole, "cartpole"), (excenvs.Acrobot, "acrobot")]:
    B5, T5 = 65536, 8192
    acts5 = jax.random.uniform(jax.random.PRNGKey(60), (T5, B5, 1), minval=-0.8, maxval=0.8)
    fence5 = (
        mean_leaf("deflection") if name == "cartpole" else mean_leaf("theta_1")
    )
    for fast in (False, True):
        env5 = cls(batch_size=B5, tau=1e-4, fast_math=fast)
        _, state5 = env5.vmap_reset(jax.random.split(jax.random.PRNGKey(4), B5))
        chain_row(
            f"{name}_b65536_pallas_fused{'_fast_math' if fast else ''}_T{T5}",
            lambda st, a, env5=env5: env_fused_rollout(env5, st, a, time_major=True)[1],
            state5, acts5, B5 * T5, 1, 8, fence5,
        )
    del acts5

print("RESCALE ROWS DONE", flush=True)
