"""Proximal Policy Optimization, fully on-device.

The reference packages environments *for* reinforcement learning (its
``GymWrapper`` exposes the classic ``obs, reward, terminated, truncated``
loop, ``gym_wrapper.py:88-130``) but ships no agent — every consumer is
expected to bring a host-side training loop.  This module closes the loop
the TPU way: one PPO training iteration — the vectorized rollout with
same-step autoreset and per-episode tracking references, generalized
advantage estimation, and K epochs of minibatched clipped-surrogate
updates — is ONE jitted XLA program.  The host only sees per-iteration
scalar metrics; there is a single device dispatch per iteration no matter
how many environment steps, epochs, or minibatches it contains.

Design notes (TPU-first):

* The rollout is a ``lax.scan`` over time carrying the full batched state
  pytree; each step is ``env.vmap_step`` plus the reward/flag evaluation of
  the Gymnasium adapter (``wrappers/gymnasium_vector.py``), so PPO trains on
  exactly the episode semantics that adapter exposes to external libraries.
* Episode resets happen *inside* the scan (same-step autoreset): terminated
  or truncated instances are re-drawn from ``init_state`` — including fresh
  per-episode tracking references for ``control_state`` fields — without
  leaving the device.  GAE bootstraps on the critic's value of the PRE-reset
  successor observation, zeroed only at genuine termination: time-limit
  truncation keeps its bootstrap (no artificial horizon bias) while the
  post-reset value never leaks across episode boundaries.
* The policy is a tanh MLP Gaussian with state-independent log-stddev;
  actions are clipped to the engine's normalized [-1, 1] band before
  stepping (log-probabilities are taken at the unclipped sample, the
  standard continuous-control PPO convention).
* Minibatch shuffling uses per-epoch ``jax.random.permutation`` folded into
  the same program — the (epochs x minibatches) optimization sweep is one
  ``lax.scan`` over gathered index slabs.

No reference counterpart (the reference exposes no training utilities).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from exciting_environments_tpu.utils import episodes
from exciting_environments_tpu.utils.episodes import unwrap_sharded


class PPOConfig(NamedTuple):
    """Hyperparameters of :func:`train_ppo` (CleanRL-style defaults)."""

    n_steps: int = 128
    n_epochs: int = 4
    n_minibatches: int = 4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    vf_coef: float = 0.5
    ent_coef: float = 0.01
    learning_rate: float = 3e-4
    max_grad_norm: float = 0.5
    max_episode_steps: int | None = None
    normalize_advantage: bool = True


class PPOResult(NamedTuple):
    """Outcome of :func:`train_ppo`.

    ``params``: trained agent parameters (see :func:`init_agent`).
    ``metrics``: dict of per-iteration host arrays, shape ``(iterations,)``:
    ``mean_reward`` (average per-step reward collected that iteration),
    ``pg_loss``, ``value_loss``, ``entropy``, ``approx_kl``.
    """

    params: object
    metrics: dict


# ---------------------------------------------------------------------------
# agent: tanh-MLP Gaussian actor + MLP critic as a plain parameter pytree
# ---------------------------------------------------------------------------


def _mlp_init(key, sizes, dtype, final_scale=1.0):
    params = []
    for i, (m, n) in enumerate(zip(sizes[:-1], sizes[1:])):
        key, k = jax.random.split(key)
        scale = jnp.sqrt(2.0 / m) * (final_scale if i == len(sizes) - 2 else 1.0)
        params.append(
            {
                "w": (jax.random.normal(k, (m, n)) * scale).astype(dtype),
                "b": jnp.zeros((n,), dtype),
            }
        )
    return params


def _mlp_apply(params, x):
    for layer in params[:-1]:
        x = jnp.tanh(x @ layer["w"] + layer["b"])
    return x @ params[-1]["w"] + params[-1]["b"]


def init_agent(env, key, hidden=(64, 64)):
    """Initial PPO parameter pytree for ``env``.

    ``{"actor": mlp, "log_std": (action_dim,), "critic": mlp}`` — the actor
    head is down-scaled (0.01x) so the initial policy is near-uniform around
    the zero action, the standard PPO initialization.
    """
    dtype = jnp.result_type(float)
    obs_dim = len(env.obs_description)
    act_dim = env.action_dim
    k_a, k_c = jax.random.split(key)
    return {
        "actor": _mlp_init(k_a, (obs_dim, *hidden, act_dim), dtype, final_scale=0.01),
        "log_std": jnp.zeros((act_dim,), dtype),
        "critic": _mlp_init(k_c, (obs_dim, *hidden, 1), dtype, final_scale=1.0),
    }


def policy_mean(params, obs):
    """Deterministic (mean) action of the trained policy, clipped to the
    engine's normalized [-1, 1] action band.  ``obs``: ``(..., obs_dim)``."""
    return jnp.clip(_mlp_apply(params["actor"], obs), -1.0, 1.0)


def _log_prob(mean, log_std, action):
    z = (action - mean) / jnp.exp(log_std)
    return jnp.sum(-0.5 * z**2 - log_std - 0.5 * math.log(2.0 * math.pi), axis=-1)


# ---------------------------------------------------------------------------
# environment plumbing (mirrors wrappers/gymnasium_vector.py on-device)
# ---------------------------------------------------------------------------


def _fresh(env, key):
    """Random full-batch reset state with per-episode tracking references
    (drawn from the env's ``init_state`` distribution, the same source as the
    reference's ``GymWrapper.generate_new_ref``) plus its observations."""
    return episodes.reset_with_references(env, key)


def _env_step(env, state, action, elapsed, max_episode_steps, key):
    """One vector step with same-step autoreset; returns the transition and
    the post-(auto)reset carry.  Reward/flag semantics are the shared
    stepped-branch implementation of ``GymnasiumVectorEnv._step_program``
    (``episodes.step_with_flags``).  ``obs_step`` is the PRE-reset next
    observation — the true successor of the transition, needed to bootstrap
    values across time-limit truncations."""
    B = env.batch_size
    obs_s, state_s, reward, term, trunc, elapsed = episodes.step_with_flags(
        env, state, action, elapsed, max_episode_steps
    )
    done = term | trunc

    obs_r, state_r = _fresh(env, key)

    def sel(r, s):
        return jnp.where(done.reshape((B,) + (1,) * (r.ndim - 1)), r, s)

    state_n = jax.tree_util.tree_map(sel, state_r, state_s)
    obs_n = sel(obs_r, obs_s)
    elapsed = jnp.where(done, 0, elapsed)
    return obs_n, state_n, obs_s, reward, term, done, elapsed


def _rollout(env, params, carry, key, n_steps, max_episode_steps, deterministic):
    """``n_steps`` of experience as one ``lax.scan``; carry is
    ``(state, obs, elapsed)``."""

    def step_fn(c, k):
        state, obs, elapsed = c
        k_act, k_reset = jax.random.split(k)
        mean = _mlp_apply(params["actor"], obs)
        if deterministic:
            action = mean
            logp = jnp.zeros(mean.shape[:-1], mean.dtype)
        else:
            action = mean + jnp.exp(params["log_std"]) * jax.random.normal(
                k_act, mean.shape, mean.dtype
            )
            logp = _log_prob(mean, params["log_std"], action)
        value = _mlp_apply(params["critic"], obs)[..., 0]
        obs_n, state_n, obs_step, reward, term, done, elapsed = _env_step(
            env, state, jnp.clip(action, -1.0, 1.0), elapsed, max_episode_steps, k_reset
        )
        out = {
            "obs": obs,
            "action": action,
            "logp": logp,
            "value": value,
            # V(s_{t+1}) of the TRUE successor (pre-autoreset observation):
            # bootstraps through time-limit truncations, is zeroed only at
            # genuine termination
            "next_value": _mlp_apply(params["critic"], obs_step)[..., 0],
            "reward": reward,
            "term": term,
            "done": done,
        }
        return (state_n, obs_n, elapsed), out

    return jax.lax.scan(step_fn, carry, jax.random.split(key, n_steps))


def _gae(traj, gamma, lam):
    """Generalized advantage estimation (reverse scan over the horizon).

    Each stored ``next_value`` is the critic on the PRE-reset successor
    observation, so the one-step bootstrap is exact everywhere; it is
    zeroed only at genuine *termination* (time-limit truncation still
    bootstraps — treating it as terminal would train the critic toward
    returns artificially cut at the horizon).  Advantage accumulation stops
    at every episode boundary (``done``), since the next stored transition
    starts a fresh episode."""

    def f(adv_next, x):
        r, v, v_next, term, done = x
        nonterm = 1.0 - term.astype(v.dtype)
        delta = r + gamma * v_next * nonterm - v
        adv = delta + gamma * lam * (1.0 - done.astype(v.dtype)) * adv_next
        return adv, adv

    _, advs = jax.lax.scan(
        f,
        jnp.zeros_like(traj["value"][0]),
        (traj["reward"], traj["value"], traj["next_value"], traj["term"], traj["done"]),
        reverse=True,
    )
    return advs, advs + traj["value"]


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------


def train_ppo(
    env,
    iterations,
    key=None,
    config: PPOConfig = PPOConfig(),
    params=None,
    scan_iterations: bool = False,
):
    """Train a PPO agent on a batched environment, one dispatch per iteration.

    Args:
        env: a batched :class:`CoreEnvironment`, or a mesh-sharded
            ``ShardedEnv`` — the whole training program then runs SPMD over
            the mesh (batch axis sharded, parameters replicated).  Its
            tracking reward requires ``control_state`` to be set (otherwise
            every reward is 0 and there is nothing to learn).
        iterations: PPO iterations (each consumes
            ``config.n_steps * env.batch_size`` environment steps).
        key: PRNG key (default ``PRNGKey(0)``).
        config: :class:`PPOConfig`.
        params: warm-start agent parameters (default :func:`init_agent`).
        scan_iterations: fold ALL iterations into one ``lax.scan`` — a single
            device dispatch for the entire training run instead of one per
            iteration.  Metrics only reach the host at the end; the PRNG
            stream differs from the per-iteration mode (``split(key, n)``
            vs a chained split), so trajectories are not bit-identical
            between the two modes.

    Returns:
        :class:`PPOResult`.
    """
    import optax

    env, place = unwrap_sharded(env)
    if key is None:
        key = jax.random.PRNGKey(0)
    k_init, k_reset, key = jax.random.split(key, 3)
    if params is None:
        params = init_agent(env, k_init)

    B = env.batch_size
    N = config.n_steps * B
    if N % config.n_minibatches:
        raise ValueError(
            f"n_steps * batch_size = {N} must be divisible by "
            f"n_minibatches = {config.n_minibatches}"
        )
    mb_size = N // config.n_minibatches

    optimizer = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adam(config.learning_rate),
    )
    opt_state = optimizer.init(params)

    def loss_fn(p, batch):
        mean = _mlp_apply(p["actor"], batch["obs"])
        logp = _log_prob(mean, p["log_std"], batch["action"])
        value = _mlp_apply(p["critic"], batch["obs"])[..., 0]
        ratio = jnp.exp(logp - batch["logp"])
        adv = batch["adv"]
        if config.normalize_advantage:
            adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg = jnp.mean(
            jnp.maximum(
                -adv * ratio,
                -adv * jnp.clip(ratio, 1.0 - config.clip_eps, 1.0 + config.clip_eps),
            )
        )
        v_loss = 0.5 * jnp.mean((value - batch["ret"]) ** 2)
        entropy = jnp.sum(p["log_std"] + 0.5 * math.log(2.0 * math.pi * math.e))
        approx_kl = jnp.mean((ratio - 1.0) - jnp.log(ratio))
        loss = pg + config.vf_coef * v_loss - config.ent_coef * entropy
        return loss, (pg, v_loss, entropy, approx_kl)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_iteration(params, opt_state, carry, key):
        k_roll, k_perm = jax.random.split(key)
        carry, traj = _rollout(
            env, params, carry, k_roll, config.n_steps,
            config.max_episode_steps, deterministic=False,
        )
        advs, rets = _gae(traj, config.gamma, config.gae_lambda)
        data = {
            "obs": traj["obs"].reshape(N, -1),
            "action": traj["action"].reshape(N, -1),
            "logp": traj["logp"].reshape(N),
            "adv": advs.reshape(N),
            "ret": rets.reshape(N),
        }
        perms = jax.vmap(lambda k: jax.random.permutation(k, N))(
            jax.random.split(k_perm, config.n_epochs)
        ).reshape(config.n_epochs * config.n_minibatches, mb_size)

        def mb_step(c, idx):
            p, o = c
            batch = jax.tree_util.tree_map(lambda x: x[idx], data)
            (_, aux), grads = grad_fn(p, batch)
            updates, o = optimizer.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), jnp.stack(aux)

        (params, opt_state), aux = jax.lax.scan(mb_step, (params, opt_state), perms)
        metrics = jnp.concatenate([jnp.mean(traj["reward"])[None], aux.mean(axis=0)])
        return params, opt_state, carry, metrics

    obs0, state0 = jax.jit(lambda k: _fresh(env, k))(k_reset)
    carry = place((state0, obs0, jnp.zeros((B,), jnp.int32)))

    if scan_iterations and iterations:

        @jax.jit
        def run_all(params, opt_state, carry, keys):
            def f(c, k):
                p, o, cr, m = train_iteration(*c, k)
                return (p, o, cr), m

            (params, _, _), rows = jax.lax.scan(
                f, (params, opt_state, carry), keys
            )
            return params, rows

        params, rows = run_all(
            params, opt_state, carry, jax.random.split(key, iterations)
        )
    else:
        train_iteration = jax.jit(train_iteration)
        rows = []
        for _ in range(iterations):
            key, k = jax.random.split(key)
            params, opt_state, carry, metrics = train_iteration(
                params, opt_state, carry, k
            )
            rows.append(metrics)
        rows = jnp.stack(rows) if rows else jnp.zeros((0, 5))
    names = ("mean_reward", "pg_loss", "value_loss", "entropy", "approx_kl")
    return PPOResult(
        params=params,
        metrics={n: jax.device_get(rows[:, i]) for i, n in enumerate(names)},
    )


def evaluate_policy(env, params, n_steps, key=None, max_episode_steps=None):
    """Mean per-step reward of the deterministic (mean-action) policy over a
    fresh ``n_steps`` x ``batch_size`` rollout — the evaluation counterpart
    of :func:`train_ppo`'s ``mean_reward`` training metric."""
    env, place = unwrap_sharded(env)
    if key is None:
        key = jax.random.PRNGKey(0)
    k_reset, k_roll = jax.random.split(key)
    obs0, state0 = episodes.jitted_reset(env)(k_reset)
    carry = place((state0, obs0, jnp.zeros((env.batch_size,), jnp.int32)))

    def build():
        @jax.jit
        def run(params, carry, key):
            _, traj = _rollout(
                env, params, carry, key, n_steps, max_episode_steps,
                deterministic=True,
            )
            return jnp.mean(traj["reward"])

        return run

    run = episodes.cached_jit(env, "_ppo_eval_impl", (n_steps, max_episode_steps), build)
    return float(run(params, carry, k_roll))
