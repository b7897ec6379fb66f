"""Device: noise_mode="fast" stochastic rollout throughput.

The exact split-chain draw stream makes both stochastic paths
noise-generation-bound (~1.2e9 env-steps/s at b=65536: one sequential
threefry application per control step regardless of batch — measured in
``stochastic_fused_device.py``).  Fast mode derives each step's draws
counter-style from the rollout's starting key (``fold_in(key, t)``), so the
whole draw slab generates time-parallel in the XLA pre-pass.  This measures
the fast-mode fused rollout against the same session's exact-mode fused
rollout and the deterministic kernel, plus the on-device scan-vs-kernel
draw-parity gate.  Chained-marginal methodology (see BENCHMARKS.md).
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
from exciting_environments_tpu.ops.pallas import rollout_path
from exciting_environments_tpu.ops.pallas.stepper import env_fused_rollout

B, T, K = 65536, 4096, 4
NOISE = dict(process_noise={"omega": 0.3}, observation_noise={"theta": 0.02})


def make(noisy, mode="exact"):
    kw = dict(NOISE, noise_mode=mode) if noisy else {}
    return excenvs.Pendulum(batch_size=B, tau=1e-4, **kw)


keys = jax.random.split(jax.random.PRNGKey(0), B)
acts = jax.random.uniform(jax.random.PRNGKey(1), (T, B, 1), minval=-0.5, maxval=0.5)


def chain_time(env, k, scan=False):
    _, s0 = env.vmap_reset(keys)

    @jax.jit
    def chain(state, a):
        for _ in range(k):
            if scan:
                _, state = env.vmap_rollout(state, jnp.transpose(a, (1, 0, 2)), T)
            else:
                _, state = env_fused_rollout(env, state, a, time_major=True)
        return state

    out = chain(s0, acts)
    jax.block_until_ready(out)
    best = 1e9
    for rep in (1, 2):
        a = acts * (1.0 + 1e-3 * rep)
        t0 = time.perf_counter()
        st = chain(s0, a)
        f = float(jnp.mean(st.physical_state.omega))
        assert jnp.isfinite(f)
        best = min(best, time.perf_counter() - t0)
    return best


def marginal(env, scan=False):
    t1 = chain_time(env, 1, scan)
    tk = chain_time(env, K, scan)
    marg = (tk - t1) / (K - 1)
    ok = (tk - t1) > 0.3 * t1
    val = B * T / marg if ok and marg > 0 else B * T * K / tk
    return val, t1, tk, ok


fast = make(True, "fast")
assert fast._noise_mode == "fast" and rollout_path(fast) == "fused"
v_fast, t1f, tkf, okf = marginal(fast)
v_exact, _, _, oke = marginal(make(True, "exact"))
v_det, _, _, okd = marginal(make(False))
v_fast_scan, _, _, oks = marginal(fast, scan=True)

# on-device draw parity: fast-mode kernel vs fast-mode scan on a short horizon
_, s0 = fast.vmap_reset(keys)
a16 = acts[:16]
obs_f, last_f = env_fused_rollout(fast, s0, a16, time_major=True)
obs_s, last_s = fast.vmap_rollout(s0, jnp.transpose(a16, (1, 0, 2)), 16)
dev = float(jnp.max(jnp.abs(obs_f - obs_s[:, -1])))
keys_eq = bool(jnp.array_equal(last_f.PRNGKey, last_s.PRNGKey))

print(json.dumps({
    "metric": "pendulum_b65536_stochastic_fast_pallas_fused",
    "value": v_fast, "unit": "env-steps/s",
    "t1": t1f, "tk": tkf, "scaling_ok": okf,
    "exact_mode_fused_value": v_exact,
    "deterministic_fused_value": v_det,
    "fast_mode_scan_value": v_fast_scan,
    "fast_vs_exact_speedup_x": v_fast / v_exact if v_exact else None,
    "noise_overhead_x": v_det / v_fast if v_fast else None,
    "fused_vs_scan_max_abs_dev_16steps": dev,
    "final_keys_match_scan": keys_eq,
}), flush=True)
print("STOCHASTIC FAST DEVICE DONE", flush=True)
