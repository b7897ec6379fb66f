"""Device: re-measure the 12 `chain_scaling_ok: false` rows of
`BENCHMARKS_r03.json` (round-4 verdict item 6).

Round 3 committed those rows from whole-chain-jitted programs whose links
sat under the relay's ~35-40 ms latency floor.  Round-4 finding while
re-measuring: jitting a WHOLE K-link chain as one executable is itself
untrustworthy at long horizons — an 8-link jitted pendulum chain returned
in 1.45x the 1-link time (a physical impossibility for data-dependent
links), i.e. the relay's completion signal is unreliable for large fused
programs, and a "marginal" from such times overstates throughput ~1.5x
against the eagerly-chained reference (`bench.py` reproduces its round-3
sustained headline to within 2%).

This harness therefore uses `bench.py`'s proven recipe: CHAIN eager
executions per pass (each link a separate relay execution consuming the
previous link's state), one long time-major action slab, best-of-passes,
a reduced-scalar fence, and the conservative whole-chain/CHAIN value (the
per-execution latency is amortized, never subtracted).  A 2-link pass is
also timed and the `chain_scaling_ok` flag requires t(CHAIN) to grow
proportionally.  Metric names carry the horizon explicitly so
per-rollout and sustained rows of a nominally identical config can never
be confused again.

Run with no argument to execute every config in its own subprocess
(fresh HBM per config); pass a config name to run just that one.
"""
import json
import os
import subprocess
import sys
import time

CONFIGS = (
    "pendulum_scan", "pendulum_fused", "pendulum_fast",
    "msd_scan", "msd_fused",
    "cartpole_tsit5", "acrobot_tsit5",
    "pmsm_linear_fast",
    "cartpole_fused", "cartpole_fused_fast",
    "acrobot_fused", "acrobot_fused_fast",
)

if len(sys.argv) == 1:
    for cfg in CONFIGS:
        r = subprocess.run([sys.executable, os.path.abspath(__file__), cfg])
        if r.returncode != 0:
            print(json.dumps({"metric": cfg, "error": f"rc={r.returncode}"}), flush=True)
    print("RESCALE ROWS DONE", flush=True)
    sys.exit(0)

CFG = sys.argv[1]

# the three fastest configs finish a maximal-slab link in 6-35 ms — near the
# relay's latency floor — so their chains run 4x longer to amortize it
LONG_CHAIN_CFGS = ("pendulum_fast", "msd_fused", "cartpole_fused_fast")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import exciting_environments_tpu as excenvs  # noqa: E402
from exciting_environments_tpu.core import structures  # noqa: E402
from exciting_environments_tpu.ops.pallas.stepper import env_fused_rollout  # noqa: E402

CHAIN = 6
if CFG in LONG_CHAIN_CFGS:
    CHAIN = 24


def time_chained(roll_fn, warm_state, pass_states, acts, fence_leaf, chain):
    out = roll_fn(warm_state, acts)
    jax.block_until_ready(out)
    best = float("inf")
    for state0 in pass_states:
        t0 = time.perf_counter()
        st = state0
        for _ in range(chain):
            st = roll_fn(st, acts)
        fence = float(jnp.mean(fence_leaf(st)))
        elapsed = time.perf_counter() - t0
        assert jnp.isfinite(fence)
        best = min(best, elapsed)
    return best


def report(name, roll_fn, env, reset_keys, acts, fence_leaf, n_steps_per_link):
    _, state_w = env.vmap_reset(jax.random.split(jax.random.PRNGKey(6), reset_keys))
    _, state_a = env.vmap_reset(jax.random.split(jax.random.PRNGKey(5), reset_keys))
    _, state_b = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), reset_keys))
    passes = [state_a, state_b]
    t2 = time_chained(roll_fn, state_w, passes, acts, fence_leaf, 2)
    tc = time_chained(roll_fn, state_w, passes, acts, fence_leaf, CHAIN)
    # scaling gate via the affine chain model t(k) = c + k*L (c = the relay's
    # per-pass constant, L = true per-link cost): the row is trustworthy when
    # the chained WORK dominates the constant (CHAIN*L > 2c) and both fitted
    # terms are sane; the reported value stays the conservative whole/K
    # (latency included, never subtracted)
    L = (tc - t2) / (CHAIN - 2)
    c = t2 - 2 * L
    ok = L > 0 and CHAIN * L > 2 * max(c, 0.0)
    value = n_steps_per_link * CHAIN / tc
    print(json.dumps({
        "metric": name, "value": value, "unit": "env-steps/s",
        "methodology": "eager_chain_whole_over_k",
        "chain_scaling_ok": bool(ok),
        "fitted_per_link_s": L, "fitted_constant_s": c,
        "seconds_chain2": t2, "seconds_chainK": tc, "k_chain": CHAIN,
    }), flush=True)


def leaf(attr):
    return lambda st: getattr(st.physical_state, attr)


if CFG.startswith("pendulum"):
    # the scan row runs at T=8192: the batch-major slab the scan needs is a
    # full transposed copy, and T=16384 (4.3 GB x2) exhausts HBM next to the
    # scan's internals
    B, T = 65536, (8192 if CFG == "pendulum_scan" else 16384)
    env = excenvs.Pendulum(batch_size=B, tau=1e-4)
    acts = jax.random.uniform(jax.random.PRNGKey(50), (T, B, 1), minval=-1, maxval=1)
    if CFG == "pendulum_scan":
        fn = lambda st, a: env.vmap_rollout(st, jnp.swapaxes(a, 0, 1), T)[1]
    elif CFG == "pendulum_fused":
        fn = jax.jit(lambda st, a: env_fused_rollout(env, st, a, time_major=True)[1])
    else:
        from exciting_environments_tpu.ops.pallas.pendulum_fast import pendulum_fast_rollout

        @jax.jit
        def fn(st, a):
            th, om = pendulum_fast_rollout(env, st, a, time_major=True)
            return structures.replace(st, physical_state=env.PhysicalState(theta=th, omega=om))

    report(f"{CFG}_b65536_T{T}", fn, env, B, acts, leaf("theta"), B * T)

elif CFG.startswith("msd"):
    B, T = 16384, 16384
    env = excenvs.MassSpringDamper(batch_size=B)
    acts = jax.random.uniform(jax.random.PRNGKey(10), (T, B, 1), minval=-1, maxval=1)
    if CFG == "msd_scan":
        fn = lambda st, a: env.vmap_rollout(st, jnp.swapaxes(a, 0, 1), T)[1]
    else:
        fn = jax.jit(lambda st, a: env_fused_rollout(env, st, a, time_major=True)[1])
    report(f"{CFG}_b16384_T{T}", fn, env, B, acts, leaf("deflection"), B * T)

elif CFG.endswith("_tsit5"):
    B, T = 4096, 4096
    cls = excenvs.CartPole if CFG.startswith("cartpole") else excenvs.Acrobot
    env = cls(batch_size=B, solver="tsit5")
    acts = jax.random.uniform(
        jax.random.PRNGKey(20), (B, T, env.action_dim), minval=-0.5, maxval=0.5
    )
    fn = lambda st, a: env.vmap_sim_ahead(st, a, env.tau, env.tau)[2]
    fence = leaf("deflection" if CFG.startswith("cartpole") else "theta_1")
    report(f"{CFG}_sim_ahead_b4096_T{T}", fn, env, B, acts, fence, B * T)

elif CFG == "pmsm_linear_fast":
    from exciting_environments_tpu.ops.pmsm_fast import pmsm_fast_rollout

    # LOCKED-ROTOR configuration (omega_el = 0): open-loop explicit Euler on
    # the salient linear machine at mid-band speed is UNSTABLE —
    # |1 + j*omega*tau*sqrt(l_q/l_d)| ~ 1.047/step at omega ~ 1700 rad/s —
    # so ANY horizon past ~1500 steps overflows f32 (the r03 T=512 row was
    # simply short enough to stay finite while growing e^23).  At omega = 0
    # the subsystem is a stable RL circuit, the arithmetic per step is
    # identical, and the long-horizon throughput row is physically
    # meaningful.
    B, T = 65536, 8192
    env = excenvs.PMSM(batch_size=B, motor_variant=excenvs.MotorVariant.DEFAULT)
    acts = jax.random.uniform(jax.random.PRNGKey(40), (B, T, 2), minval=-0.3, maxval=0.3)

    _orig_report = report

    def report(name, roll_fn, env_, reset_keys, acts_, fence_leaf, n_steps):
        def lock(state):
            return structures.replace(
                state,
                physical_state=structures.replace(
                    state.physical_state, omega_el=jnp.zeros(B)
                ),
            )

        _, sw = env_.vmap_reset(jax.random.split(jax.random.PRNGKey(6), reset_keys))
        _, sa = env_.vmap_reset(jax.random.split(jax.random.PRNGKey(5), reset_keys))
        _, sb = env_.vmap_reset(jax.random.split(jax.random.PRNGKey(0), reset_keys))
        passes = [lock(sa), lock(sb)]
        t2 = time_chained(roll_fn, lock(sw), passes, acts_, fence_leaf, 2)
        tc = time_chained(roll_fn, lock(sw), passes, acts_, fence_leaf, CHAIN)
        ok = tc > (CHAIN / 2) * 0.7 * t2
        value = n_steps * CHAIN / tc
        print(json.dumps({
            "metric": name, "value": value, "unit": "env-steps/s",
            "methodology": "eager_chain_whole_over_k",
            "chain_scaling_ok": bool(ok),
            "seconds_chain2": t2, "seconds_chain6": tc, "k_chain": CHAIN,
            "config_note": "locked_rotor_omega0_euler_stability",
        }), flush=True)

    fn = jax.jit(lambda st, a: pmsm_fast_rollout(env, st, a))
    report(f"pmsm_linear_fast_math_b65536_T{T}", fn, env, B, acts, leaf("i_d"), B * T)

else:  # cartpole/acrobot fused, exact or fast-math
    B, T = 65536, 8192
    cls = excenvs.CartPole if CFG.startswith("cartpole") else excenvs.Acrobot
    fast = CFG.endswith("_fast")
    env = cls(batch_size=B, tau=1e-4, fast_math=fast)
    acts = jax.random.uniform(jax.random.PRNGKey(60), (T, B, 1), minval=-0.8, maxval=0.8)
    fn = jax.jit(lambda st, a: env_fused_rollout(env, st, a, time_major=True)[1])
    fence = leaf("deflection" if CFG.startswith("cartpole") else "theta_1")
    report(f"{CFG}_b65536_T{T}", fn, env, B, acts, fence, B * T)
