"""Round-5 RL profile + kernel-backed collection rows (r4 VERDICT item 4).

Three questions, answered on device with the eager-chain methodology
(CLAUDE.md: separate relay executions threading state/params, scalar
fence, marginal from chain growth):

1. Where does ``train_ppo``'s iteration time go — collection (the
   per-step scan: env step + 3 MLP applies + same-step autoreset) or the
   minibatched updates?
2. What does the kernel-backed collector (``rl_fused._collect_chunk`` via
   the fused closed-loop kernel, in-kernel actor + in-kernel exploration
   noise) collect at, vs the scan collector on the same tile?
3. What is the end-to-end ``train_ppo_fused`` iteration rate vs
   ``train_ppo`` at the same steps/iteration?

Each row prints one JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.utils import episodes
from exciting_environments_tpu.utils import rl as rl_mod
from exciting_environments_tpu.utils import rl_fused
from exciting_environments_tpu.utils.rl import PPOConfig, init_agent
from exciting_environments_tpu.utils.rl_fused import FusedPPOConfig

B = 65536
T = 64  # steps per iteration/chunk (the README RL config's n_steps)
K = 6


def chain(fn, carries, fence):
    """Best-of-2 eager chain of K sequentially dependent calls; returns
    seconds per call.  ``carries``: list of >= 2 distinct starting carries
    (cache-proof); ``fn(carry) -> carry``; ``fence(carry) -> scalar leaf``."""
    c = fn(carries[0])  # compile + route
    float(jnp.mean(fence(c)))
    best = float("inf")
    for c0 in carries[1:]:
        t0 = time.perf_counter()
        c = c0
        for _ in range(K):
            c = fn(c)
        float(jnp.mean(fence(c)))
        best = min(best, time.perf_counter() - t0)
    return best / K


def row(**kw):
    print(json.dumps(kw), flush=True)


env = excenvs.Pendulum(batch_size=B, tau=2e-2, control_state=["theta"])
cfg = PPOConfig(n_steps=T, max_episode_steps=T, n_minibatches=8, n_epochs=4)
params = init_agent(env, jax.random.PRNGKey(42), hidden=(16, 16))

# ---- 1. train_ppo split: collection vs update -------------------------------
obs0, state0 = jax.jit(lambda k: episodes.reset_with_references(env, k))(
    jax.random.PRNGKey(0)
)
carry0 = (state0, obs0, jnp.zeros((B,), jnp.int32))


@jax.jit
def collect_only(c):
    carry, key = c
    carry, traj = rl_mod._rollout(env, params, carry, key, T, T, False)
    # fold the trajectory into the carry chain so links stay data-dependent
    k2 = jax.random.fold_in(key, jnp.asarray(jnp.sum(traj["reward"]), jnp.int32) & 1023)
    return carry, k2


t_collect = chain(
    collect_only,
    [(carry0, jax.random.PRNGKey(1)), (carry0, jax.random.PRNGKey(2)),
     (carry0, jax.random.PRNGKey(3))],
    lambda c: c[0][1],
)
row(metric="ppo_collection_scan_steps_per_s", value=B * T / t_collect,
    unit="env-steps/s", seconds_per_iter=t_collect, config=f"b{B}_T{T}_mlp16x16")

# update-only: fixed data, chained through params
import optax

N = B * T
optimizer = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(3e-4))
opt_state0 = optimizer.init(params)
data = {
    "obs": jax.random.normal(jax.random.PRNGKey(5), (N, len(env.obs_description))),
    "action": jax.random.normal(jax.random.PRNGKey(6), (N, 1)) * 0.3,
    "logp": jnp.zeros((N,)),
    "adv": jax.random.normal(jax.random.PRNGKey(7), (N,)),
    "ret": jax.random.normal(jax.random.PRNGKey(8), (N,)),
}
mb = N // cfg.n_minibatches


@jax.jit
def update_only(c):
    p, o, key = c
    perms = jax.vmap(lambda k: jax.random.permutation(k, N))(
        jax.random.split(key, cfg.n_epochs)
    ).reshape(cfg.n_epochs * cfg.n_minibatches, mb)

    def loss_fn(pp, batch):
        mean = rl_mod._mlp_apply(pp["actor"], batch["obs"])
        logp = rl_mod._log_prob(mean, pp["log_std"], batch["action"])
        value = rl_mod._mlp_apply(pp["critic"], batch["obs"])[..., 0]
        ratio = jnp.exp(logp - batch["logp"])
        pg = jnp.mean(jnp.maximum(-batch["adv"] * ratio,
                                  -batch["adv"] * jnp.clip(ratio, 0.8, 1.2)))
        return pg + 0.5 * jnp.mean((value - batch["ret"]) ** 2)

    def mb_step(cc, idx):
        p2, o2 = cc
        g = jax.grad(loss_fn)(p2, jax.tree_util.tree_map(lambda x: x[idx], data))
        up, o2 = optimizer.update(g, o2, p2)
        return (optax.apply_updates(p2, up), o2), None

    (p, o), _ = jax.lax.scan(mb_step, (p, o), perms)
    return p, o, jax.random.fold_in(key, 1)


t_update = chain(
    update_only,
    [(params, opt_state0, jax.random.PRNGKey(11)),
     (params, opt_state0, jax.random.PRNGKey(12)),
     (params, opt_state0, jax.random.PRNGKey(13))],
    lambda c: c[0]["log_std"],
)
row(metric="ppo_update_seconds_per_iter", value=t_update, unit="s",
    collection_seconds=t_collect,
    collection_fraction=t_collect / (t_collect + t_update),
    config=f"b{B}_T{T}_epochs4_mb8")

# ---- 2. kernel-backed collection throughput --------------------------------
from exciting_environments_tpu.ops.pallas import select_closed_loop
from exciting_environments_tpu.utils.collect import tile_policy_scan

tile, tcarry0 = rl_fused.make_actor_tile(env)
actor_params = {"actor": params["actor"], "log_std": params["log_std"],
                "seed": jnp.asarray(7.0)}
kernel, extra = select_closed_loop(env, False)
assert kernel is not None
TC = 512  # longer chunks amortize the relay latency


def k_collect(st):
    obs_t, acts_t, traj_state, final, _fc = kernel(
        env, st, tile, TC, obs_stride=1, policy_params=actor_params,
        return_traj_states=True, policy_carry=tcarry0, **extra,
    )
    return final


# reset WITH references: a tracking env's reference columns are NaN on a
# plain reset, which would poison the actor MLP
_, s_a = jax.jit(lambda k: episodes.reset_with_references(env, k))(jax.random.PRNGKey(21))
_, s_b = jax.jit(lambda k: episodes.reset_with_references(env, k))(jax.random.PRNGKey(22))
_, s_c = jax.jit(lambda k: episodes.reset_with_references(env, k))(jax.random.PRNGKey(23))
t_k = chain(k_collect, [s_a, s_b, s_c], lambda st: st.physical_state.theta)
row(metric="ppo_collection_kernel_steps_per_s", value=B * TC / t_k,
    unit="env-steps/s", seconds_per_chunk=t_k,
    config=f"b{B}_T{TC}_actor16x16_in_kernel_noise",
    speedup_vs_scan_collector=(B * TC / t_k) / (B * T / t_collect))


def s_collect(st):
    _obs, _acts, _traj, final, _fc = tile_policy_scan(
        env, st, TC, tile, actor_params, True, policy_carry=tcarry0,
    )
    return final


t_s = chain(s_collect, [s_a, s_b, s_c], lambda st: st.physical_state.theta)
row(metric="ppo_collection_tile_scan_steps_per_s", value=B * TC / t_s,
    unit="env-steps/s", seconds_per_chunk=t_s)

# ---- 3. end-to-end iteration rate ------------------------------------------
fcfg = FusedPPOConfig(chunk_steps=T, n_chunks=1, n_minibatches=8, n_epochs=4)
for collector in ("kernel", "scan"):
    t0 = time.perf_counter()
    res = rl_fused.train_ppo_fused(
        env, 1, key=jax.random.PRNGKey(31), config=fcfg, collector=collector
    )
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_it = 5
    res = rl_fused.train_ppo_fused(
        env, n_it, key=jax.random.PRNGKey(32), config=fcfg, collector=collector
    )
    per_it = (time.perf_counter() - t0 - compile_s * 0) / n_it
    row(metric=f"train_ppo_fused_{collector}_steps_per_s",
        value=B * T / per_it, unit="env-steps/s (incl. updates)",
        seconds_per_iteration=per_it,
        mean_reward_tail=float(res.metrics["mean_reward"][-1]))

t0 = time.perf_counter()
rl_mod.train_ppo(env, 1, key=jax.random.PRNGKey(33), config=cfg, params=params)
c1 = time.perf_counter() - t0
t0 = time.perf_counter()
rl_mod.train_ppo(env, 5, key=jax.random.PRNGKey(34), config=cfg, params=params)
per_it_ref = (time.perf_counter() - t0) / 5
row(metric="train_ppo_scan_steps_per_s", value=B * T / per_it_ref,
    unit="env-steps/s (incl. updates)", seconds_per_iteration=per_it_ref)
