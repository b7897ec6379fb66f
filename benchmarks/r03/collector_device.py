"""Device: fused open-loop collection WITH rewards (VERDICT r02 item 5).

``RolloutCollector.collect_fused`` = one jitted program per dataset: the
Pallas kernel streams every per-step state to HBM, and rewards/terminated/
truncated are evaluated on the reconstructed states in the same program
(reference semantics bar: ``gym_wrapper.py:88-130`` — reward on the
post-step state under the taken action).  This measures the whole thing —
kernel + trajectory write + reward/flag evaluation — with the
chained-marginal methodology (BENCHMARKS.md): collects are sequentially
data-dependent through ``final_state`` and every chain link's reward sum is
consumed, so no link can be skipped, cached, or dead-code-eliminated.
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
from exciting_environments_tpu.core.structures import replace
from exciting_environments_tpu.ops.pallas import rollout_path
from exciting_environments_tpu.utils.collect import RolloutCollector

B = int(os.environ.get("COLLECT_B", 65536))
T = int(os.environ.get("COLLECT_T", 2048))
K = int(os.environ.get("COLLECT_K", 6))

env = excenvs.Pendulum(batch_size=B, tau=1e-4, control_state=["theta"])
assert rollout_path(env) == "fused", rollout_path(env)
col = RolloutCollector(env)

keys = jax.random.split(jax.random.PRNGKey(0), B)
acts = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 1), minval=-0.5, maxval=0.5)


def reset_with_refs():
    # a plain reset leaves tracking references NaN (reference semantics:
    # the GymWrapper draws them) — seed them so rewards are live numbers
    _, s0 = env.vmap_reset(keys)
    theta_ref = jax.random.uniform(
        jax.random.PRNGKey(2), (B,), minval=-jnp.pi, maxval=jnp.pi
    )
    return replace(s0, reference=replace(s0.reference, theta=theta_ref))


def chain_time(k):
    s0 = reset_with_refs()

    @jax.jit
    def chain(state, a):
        tot = jnp.float32(0.0)
        for _ in range(k):
            tb, state = col.collect_fused(state, a)
            tot = tot + jnp.sum(tb.rewards)
        return tot, state

    out = chain(s0, acts)
    jax.block_until_ready(out)
    best = 1e9
    for rep in (1, 2):
        a = acts * (1.0 + 1e-3 * rep)
        t0 = time.perf_counter()
        tot, st = chain(s0, a)
        f = float(tot) + float(jnp.mean(st.physical_state.omega))
        assert jnp.isfinite(f)
        best = min(best, time.perf_counter() - t0)
    return best


t1 = chain_time(1)
tk = chain_time(K)
marg = (tk - t1) / (K - 1)
ok = (tk - t1) > 0.3 * t1
val = B * T / marg if ok and marg > 0 else B * T * K / tk

print(json.dumps({
    "metric": "pendulum_b65536_collect_fused_with_rewards",
    "value": val, "unit": "env-steps/s (kernel + trajectory write + reward/term/trunc eval)",
    "config": f"pendulum_b{B}_T{T}_control_state_theta",
    "t1": t1, "tk": tk, "k": K, "scaling_ok": ok,
}), flush=True)
print("COLLECTOR DEVICE DONE", flush=True)
