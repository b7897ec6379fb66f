"""Soft Actor-Critic, fully on-device (off-policy companion to ``rl.py``).

PPO (``utils/rl.py``) is on-policy: every transition is consumed once.  SAC
keeps a replay buffer — here a fixed-capacity ring buffer of device arrays
that lives inside the jitted training program, so one iteration (vectorized
environment steps with same-step autoreset, buffer insertion, M gradient
updates on uniformly sampled minibatches, polyak target tracking, and the
entropy-temperature update) is ONE XLA dispatch.  The buffer never visits
the host: insertion is a ``dynamic_update_slice`` at a modular write
pointer, sampling is a ``random.randint`` gather.

Agent: squashed-Gaussian actor (tanh of a reparameterized sample, with the
standard ``log(1 - tanh^2)`` change-of-variables correction), twin Q
critics with polyak-averaged targets, and a learnable temperature ``alpha``
driven toward ``target_entropy`` (default ``-action_dim``).

Environment semantics are shared with PPO and the Gymnasium adapter:
``episodes.step_with_flags`` + same-step autoreset, with the stored
``next_obs`` being the PRE-reset successor and bootstrapping cut only at
genuine termination (time-limit truncation bootstraps).

No reference counterpart (the reference exposes no training utilities).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from exciting_environments_tpu.utils import episodes
from exciting_environments_tpu.utils.episodes import unwrap_sharded
from exciting_environments_tpu.utils.rl import (
    _env_step,
    _log_prob,
    _mlp_apply,
    _mlp_init,
)


class SACConfig(NamedTuple):
    """Hyperparameters of :func:`train_sac`.

    Each iteration collects ``n_steps x env.batch_size`` transitions and
    performs ``updates_per_iteration`` gradient updates on minibatches of
    ``update_batch_size``.  ``buffer_capacity`` must be a multiple of
    ``n_steps * env.batch_size`` (keeps ring insertion a single static
    slice).  ``learning_starts`` transitions are collected with uniform
    random actions before the policy takes over and updates begin.
    """

    n_steps: int = 8
    updates_per_iteration: int = 8
    update_batch_size: int = 1024
    buffer_capacity: int = 2**17
    gamma: float = 0.99
    polyak: float = 0.995
    learning_rate: float = 3e-4
    target_entropy: float | None = None
    learning_starts: int = 4096
    max_episode_steps: int | None = None


class SACResult(NamedTuple):
    """Outcome of :func:`train_sac`.

    ``params``: trained parameters (``actor``, ``q1``, ``q2``, targets,
    ``log_alpha``).  ``metrics``: per-iteration host arrays
    (``mean_reward``, ``q_loss``, ``actor_loss``, ``alpha``, ``entropy``).
    """

    params: object
    metrics: dict


_LOG_STD_MIN, _LOG_STD_MAX = -5.0, 2.0


def init_sac_agent(env, key, hidden=(128, 128)):
    """Initial SAC parameter pytree: squashed-Gaussian actor (one MLP with
    ``2 * action_dim`` outputs: mean and log-std), twin Q critics over
    ``(obs, action)``, their polyak targets, and ``log_alpha``."""
    dtype = jnp.result_type(float)
    obs_dim = len(env.obs_description)
    act_dim = env.action_dim
    k_a, k_1, k_2 = jax.random.split(key, 3)
    q_sizes = (obs_dim + act_dim, *hidden, 1)
    q1 = _mlp_init(k_1, q_sizes, dtype)
    q2 = _mlp_init(k_2, q_sizes, dtype)
    return {
        "actor": _mlp_init(k_a, (obs_dim, *hidden, 2 * act_dim), dtype, final_scale=0.01),
        "q1": q1,
        "q2": q2,
        "q1_target": jax.tree_util.tree_map(jnp.copy, q1),
        "q2_target": jax.tree_util.tree_map(jnp.copy, q2),
        "log_alpha": jnp.zeros((), dtype),
    }


def _actor_dist(params, obs):
    out = _mlp_apply(params["actor"], obs)
    mean, log_std = jnp.split(out, 2, axis=-1)
    return mean, jnp.clip(log_std, _LOG_STD_MIN, _LOG_STD_MAX)


def _sample_action(params, obs, key):
    """Reparameterized tanh-Gaussian sample and its log-probability."""
    mean, log_std = _actor_dist(params, obs)
    u = mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape, mean.dtype)
    # Gaussian density shared with the PPO agent + the tanh change of
    # variables (numerically stable form)
    logp = _log_prob(mean, log_std, u) - jnp.sum(
        2.0 * (math.log(2.0) - u - jax.nn.softplus(-2.0 * u)), axis=-1
    )
    return jnp.tanh(u), logp


def sac_policy_mean(params, obs):
    """Deterministic (tanh of the mean) action of a trained SAC agent."""
    mean, _ = _actor_dist(params, obs)
    return jnp.tanh(mean)


def _q(params_q, obs, act):
    return _mlp_apply(params_q, jnp.concatenate([obs, act], axis=-1))[..., 0]


def train_sac(
    env,
    iterations,
    key=None,
    config: SACConfig = SACConfig(),
    params=None,
    scan_iterations: bool = False,
):
    """Train a SAC agent on a batched environment, one dispatch per iteration.

    Args:
        env: a batched :class:`CoreEnvironment` (or a mesh-sharded
            ``ShardedEnv``); its tracking reward requires ``control_state``.
        iterations: training iterations (each consumes
            ``config.n_steps * env.batch_size`` env steps and performs
            ``config.updates_per_iteration`` gradient updates).
        key: PRNG key (default ``PRNGKey(0)``).
        config: :class:`SACConfig`.
        params: warm-start parameters (default :func:`init_sac_agent`).
        scan_iterations: fold ALL iterations (including the ring buffer as
            scan carry) into one ``lax.scan`` — a single device dispatch for
            the entire run.  The PRNG stream differs from the per-iteration
            mode (``split(key, n)`` vs a chained split).

    Returns:
        :class:`SACResult`.
    """
    import optax

    env, place = unwrap_sharded(env)
    if key is None:
        key = jax.random.PRNGKey(0)
    k_init, k_reset, key = jax.random.split(key, 3)
    if params is None:
        params = init_sac_agent(env, k_init)

    B = env.batch_size
    A = env.action_dim
    obs_dim = len(env.obs_description)
    chunk = config.n_steps * B
    C = config.buffer_capacity
    if C % chunk:
        raise ValueError(
            f"buffer_capacity = {C} must be a multiple of n_steps * "
            f"batch_size = {chunk} (static ring-buffer insertion)"
        )
    target_entropy = (
        -float(A) if config.target_entropy is None else float(config.target_entropy)
    )
    dtype = jnp.result_type(float)

    optimizer = optax.adam(config.learning_rate)
    trainable = ("actor", "q1", "q2", "log_alpha")
    opt_state = {k: optimizer.init(params[k]) for k in trainable}

    buffer = {
        "obs": jnp.zeros((C, obs_dim), dtype),
        "action": jnp.zeros((C, A), dtype),
        "reward": jnp.zeros((C,), dtype),
        "next_obs": jnp.zeros((C, obs_dim), dtype),
        "term": jnp.zeros((C,), jnp.bool_),
    }

    def collect(params, carry, ptr, total, buffer, key):
        """n_steps of experience (same-step autoreset) appended to the ring."""

        def step_fn(c, xs):
            k, i = xs
            state, obs, elapsed = c
            k_act, k_rand, k_reset = jax.random.split(k, 3)
            a_pi, _ = _sample_action(params, obs, k_act)
            a_rand = jax.random.uniform(k_rand, a_pi.shape, a_pi.dtype, -1.0, 1.0)
            # per-step warmup gate: `total + i * B` transitions were stored
            # before this step, so learning_starts is honored at step (not
            # whole-chunk) granularity
            action = jnp.where(total + i * B < config.learning_starts, a_rand, a_pi)
            obs_n, state_n, obs_step, reward, term, done, elapsed = _env_step(
                env, state, action, elapsed, config.max_episode_steps, k_reset
            )
            out = {
                "obs": obs,
                "action": action,
                "reward": reward,
                "next_obs": obs_step,
                # bootstrap is cut only at genuine termination; a time-limit
                # truncation keeps its target (same convention as rl._gae)
                "term": term,
            }
            return (state_n, obs_n, elapsed), out

        carry, traj = jax.lax.scan(
            step_fn, carry,
            (jax.random.split(key, config.n_steps),
             jnp.arange(config.n_steps, dtype=total.dtype)),
        )
        flat = jax.tree_util.tree_map(
            lambda x: x.reshape((chunk,) + x.shape[2:]), traj
        )
        zero = jnp.zeros((), ptr.dtype)
        buffer = {
            k: jax.lax.dynamic_update_slice(
                buffer[k], flat[k].astype(buffer[k].dtype),
                (ptr,) + (zero,) * (buffer[k].ndim - 1),
            )
            for k in buffer
        }
        mean_reward = jnp.mean(traj["reward"])
        ptr = (ptr + chunk) % C
        total = total + chunk
        return carry, ptr, total, buffer, mean_reward

    def update(params, opt_state, buffer, size, key):
        k_idx, k_next, k_pi = jax.random.split(key, 3)
        idx = jax.random.randint(k_idx, (config.update_batch_size,), 0, size)
        batch = {k: v[idx] for k, v in buffer.items()}

        # critic target from the frozen networks
        a_next, logp_next = _sample_action(params, batch["next_obs"], k_next)
        q_next = jnp.minimum(
            _q(params["q1_target"], batch["next_obs"], a_next),
            _q(params["q2_target"], batch["next_obs"], a_next),
        )
        alpha = jnp.exp(params["log_alpha"])
        nonterm = 1.0 - batch["term"].astype(q_next.dtype)
        y = batch["reward"] + config.gamma * nonterm * (q_next - alpha * logp_next)
        y = jax.lax.stop_gradient(y)

        def q_loss_fn(q1, q2):
            l1 = jnp.mean((_q(q1, batch["obs"], batch["action"]) - y) ** 2)
            l2 = jnp.mean((_q(q2, batch["obs"], batch["action"]) - y) ** 2)
            return l1 + l2

        q_loss, (g1, g2) = jax.value_and_grad(q_loss_fn, argnums=(0, 1))(
            params["q1"], params["q2"]
        )

        def actor_loss_fn(actor_params):
            p = dict(params, actor=actor_params)
            a, logp = _sample_action(p, batch["obs"], k_pi)
            q_min = jnp.minimum(
                _q(params["q1"], batch["obs"], a), _q(params["q2"], batch["obs"], a)
            )
            return jnp.mean(alpha * logp - q_min), logp

        (actor_loss, logp_pi), g_actor = jax.value_and_grad(
            actor_loss_fn, has_aux=True
        )(params["actor"])

        def alpha_loss_fn(log_alpha):
            return -jnp.mean(
                jnp.exp(log_alpha) * jax.lax.stop_gradient(logp_pi + target_entropy)
            )

        alpha_loss, g_alpha = jax.value_and_grad(alpha_loss_fn)(params["log_alpha"])

        new = dict(params)
        for name, grad in (("q1", g1), ("q2", g2), ("actor", g_actor),
                           ("log_alpha", g_alpha)):
            upd, opt_state[name] = optimizer.update(grad, opt_state[name], params[name])
            new[name] = optax.apply_updates(params[name], upd)
        # polyak target tracking
        for q in ("q1", "q2"):
            new[f"{q}_target"] = jax.tree_util.tree_map(
                lambda t, s: config.polyak * t + (1.0 - config.polyak) * s,
                params[f"{q}_target"], new[q],
            )
        metrics = jnp.stack(
            [q_loss, actor_loss, jnp.exp(new["log_alpha"]), -jnp.mean(logp_pi)]
        )
        return new, opt_state, metrics

    def train_iteration(params, opt_state, carry, ptr, total, buffer, key):
        k_collect, k_update = jax.random.split(key)
        carry, ptr, total, buffer, mean_reward = collect(
            params, carry, ptr, total, buffer, k_collect
        )
        size = jnp.minimum(total, C)

        def do_updates(args):
            params, opt_state = args

            def one(c, k):
                p, o = c
                p, o, m = update(p, o, buffer, size, k)
                return (p, o), m

            (params, opt_state), ms = jax.lax.scan(
                one, (params, opt_state),
                jax.random.split(k_update, config.updates_per_iteration),
            )
            return params, opt_state, ms.mean(axis=0)

        def skip(args):
            params, opt_state = args
            # update-dependent metrics (q_loss, actor_loss, entropy) are 0
            # during warmup; alpha reports its true value so the temperature
            # trace is continuous
            zero = jnp.zeros((), dtype)
            return params, opt_state, jnp.stack(
                [zero, zero, jnp.exp(params["log_alpha"]).astype(dtype), zero]
            )

        params, opt_state, upd_metrics = jax.lax.cond(
            total >= config.learning_starts, do_updates, skip, (params, opt_state)
        )
        metrics = jnp.concatenate([mean_reward[None], upd_metrics])
        return params, opt_state, carry, ptr, total, buffer, metrics

    obs0, state0 = jax.jit(lambda k: episodes.reset_with_references(env, k))(k_reset)
    carry = place((state0, obs0, jnp.zeros((B,), jnp.int32)))
    ptr = jnp.zeros((), jnp.int32)
    total = jnp.zeros((), jnp.int32)

    if scan_iterations and iterations:

        @jax.jit
        def run_all(params, opt_state, carry, ptr, total, buffer, keys):
            def f(c, k):
                out = train_iteration(*c, k)
                return out[:-1], out[-1]

            (params, *_), rows = jax.lax.scan(
                f, (params, opt_state, carry, ptr, total, buffer), keys
            )
            return params, rows

        params, rows = run_all(
            params, opt_state, carry, ptr, total, buffer,
            jax.random.split(key, iterations),
        )
    else:
        train_it = jax.jit(train_iteration)
        rows = []
        for _ in range(iterations):
            key, k = jax.random.split(key)
            params, opt_state, carry, ptr, total, buffer, metrics = train_it(
                params, opt_state, carry, ptr, total, buffer, k
            )
            rows.append(metrics)
        rows = jnp.stack(rows) if rows else jnp.zeros((0, 5))
    names = ("mean_reward", "q_loss", "actor_loss", "alpha", "entropy")
    return SACResult(
        params=params,
        metrics={n: jax.device_get(rows[:, i]) for i, n in enumerate(names)},
    )


def evaluate_sac(env, params, n_steps, key=None, max_episode_steps=None):
    """Mean per-step reward of the deterministic (tanh-mean) SAC policy over
    a fresh rollout — counterpart of ``rl.evaluate_policy``."""
    env, place = unwrap_sharded(env)
    if key is None:
        key = jax.random.PRNGKey(0)
    k_reset, k_roll = jax.random.split(key)
    obs0, state0 = episodes.jitted_reset(env)(k_reset)
    carry = place((state0, obs0, jnp.zeros((env.batch_size,), jnp.int32)))

    def build():
        @jax.jit
        def run(params, carry, key):
            def step_fn(c, k):
                state, obs, elapsed = c
                action = sac_policy_mean(params, obs)
                obs_n, state_n, _, reward, _, _, elapsed = _env_step(
                    env, state, action, elapsed, max_episode_steps, k
                )
                return (state_n, obs_n, elapsed), reward

            _, rewards = jax.lax.scan(step_fn, carry, jax.random.split(key, n_steps))
            return jnp.mean(rewards)

        return run

    run = episodes.cached_jit(env, "_sac_eval_impl", (n_steps, max_episode_steps), build)
    return float(run(params, carry, k_roll))
