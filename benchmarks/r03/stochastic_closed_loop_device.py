"""Device: STOCHASTIC policy-in-kernel closed loop (pendulum under noise).

Output-feedback control under sensor + process noise at kernel speed: the
noise pre-pass computes the rollout draw stream and the kernel streams the
pre-scaled slabs (4 B/env-step per noisy column) while the PD law closes the
loop over the NOISY theta measurement.  The interesting number is the DELTA
vs the deterministic closed loop (`closed_loop_device.py`, 3.3e10): the
noisy loop pays the draw-stream generation (exact mode: a sequential
split-chain — the same noise roofline the open-loop stochastic rollout
meets; fast mode: time-parallel counter draws) plus two streamed slabs.

Chained-marginal timing per the relay methodology (links consume the
previous link's final state AND its advanced PRNG keys, so no link can be
served from the relay cache).
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import exciting_environments_tpu as excenvs
from exciting_environments_tpu.core import structures
from exciting_environments_tpu.ops.pallas.stepper import env_fused_closed_loop

B, T, K = 65536, 4096, 4


def policy_tile(obs, t):
    return (jnp.clip(-0.9 * obs[0] - 0.25 * obs[1], -1.0, 1.0),)


def run(noise_mode):
    env = excenvs.Pendulum(
        batch_size=B, process_noise={"omega": 0.2},
        observation_noise={"theta": 0.03}, noise_mode=noise_mode,
    )
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B))

    def chain_time(k):
        e = excenvs.Pendulum(
            batch_size=B, process_noise={"omega": 0.2},
            observation_noise={"theta": 0.03}, noise_mode=noise_mode,
        )

        @jax.jit
        def chain(state):
            for _ in range(k):
                _, state = env_fused_closed_loop(e, state, policy_tile, T)
            return state

        out = chain(s0)
        jax.block_until_ready(out)
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
    print(json.dumps({
        "metric": f"pendulum_stochastic_closed_loop_in_kernel_steps_per_s_{noise_mode}",
        "value": val, "t1": t1, "tk": tk, "scaling_ok": ok,
        "config": f"b65536_T4096_PD_on_noisy_theta_{noise_mode}",
    }), flush=True)


run("exact")
run("fast")
print("STOCHASTIC CLOSED LOOP DEVICE DONE", flush=True)
