"""Episode-state helpers shared by the RL / MPC / wrapper layers.

An env's ``vmap_reset`` returns states whose ``reference`` fields are NaN
placeholders (reference semantics, ``core_env.py:361-391``) — the tracking
reward is only meaningful once references are populated.  The reference's
``GymWrapper.generate_new_ref`` (``gym_wrapper.py:177-192``) draws them
from the ``init_state`` distribution; these helpers are the one shared,
jit-compatible implementation of that convention used by
``wrappers/gymnasium_vector.py``, ``utils/rl.py`` and ``utils/mpc.py``.
"""

from __future__ import annotations

import jax

from exciting_environments_tpu.core import structures


def unwrap_sharded(env):
    """Split a possibly mesh-sharded env facade into ``(core_env, place)``.

    ``place`` puts a batch-leading pytree onto the facade's mesh sharding
    (identity for a plain env).  The RL/MPC loops run on the unwrapped core
    env — whose ``env_properties`` the facade already re-placed per shard —
    and shard their own initial carries with ``place``; from there GSPMD
    propagates the batch sharding through the whole jitted program."""
    from exciting_environments_tpu.parallel.mesh import ShardedEnv

    if isinstance(env, ShardedEnv):
        return env.env, env.shard
    return env, lambda tree: tree


def draw_references(env, state, key):
    """Fresh per-episode tracking references for the ``control_state``
    fields of a batched ``state``, drawn from the env's ``init_state``
    distribution (the same source as the reference's
    ``GymWrapper.generate_new_ref``, ``gym_wrapper.py:177-192``)."""
    if not env.control_state:
        return state

    def one(state, props, key):
        init = env.init_state(props, key)
        with structures.copy_and_mutate(state, validate=False) as new:
            for name in env.control_state:
                setattr(new.reference, name, getattr(init.physical_state, name))
        return new

    keys = jax.random.split(key, env.batch_size)
    return jax.vmap(one, in_axes=(0, env.in_axes_env_properties, 0))(
        state, env.env_properties, keys
    )


def step_with_flags(env, state, action, elapsed=None, max_episode_steps=None):
    """One ``vmap_step`` plus the Gym-contract reward/flag evaluation —
    reward on the post-step state under the taken (normalized) action
    (reference ``gym_wrapper.py:88-130``), per-env ``any()`` over the
    engine's per-dimension terminated/truncated bools, optional episode
    time limit.  The one shared stepped-branch implementation behind
    ``wrappers/gymnasium_vector.py``, ``utils/rl.py`` and ``utils/mpc.py``
    (unused outputs are dead-code-eliminated under jit).

    Returns ``(obs, state, reward, terminated, truncated, elapsed)`` with
    ``reward``/flags of shape ``(batch_size,)`` and ``elapsed`` already
    incremented (``None`` if not passed)."""
    B = env.batch_size
    in_ax = env.in_axes_env_properties
    props = env.env_properties

    obs, state_s = env.vmap_step(state, action)
    reward_b = jax.vmap(env.generate_reward, in_axes=(0, 0, in_ax))(
        state_s, action, props
    )
    term = (
        jax.vmap(env.generate_terminated, in_axes=(0, 0, in_ax))(
            state_s, reward_b, props
        )
        .reshape(B, -1)
        .any(axis=1)
    )
    trunc = (
        jax.vmap(env.generate_truncated, in_axes=(0, in_ax))(state_s, props)
        .reshape(B, -1)
        .any(axis=1)
    )
    if elapsed is not None:
        elapsed = elapsed + 1
        if max_episode_steps is not None:
            trunc = trunc | (elapsed >= max_episode_steps)
    return obs, state_s, reward_b.reshape(B), term, trunc, elapsed


def cached_jit(env, slot, key, builder):
    """Per-env cache for jitted closures: a fresh ``@jax.jit`` closure per
    call would retrace/recompile every time (the jit cache keys on the
    function object).  ``slot`` is the ``env.__dict__`` cache name, ``key``
    the static-argument tuple, ``builder`` a zero-arg callable returning the
    jitted function."""
    cache = env.__dict__.setdefault(slot, {})
    if key not in cache:
        cache[key] = builder()
    return cache[key]


def jitted_reset(env):
    """Cached jitted :func:`reset_with_references` for ``env``."""
    return cached_jit(
        env, "_reset_refs_jit", (),
        lambda: jax.jit(lambda k: reset_with_references(env, k)),
    )


def reset_with_references(env, key):
    """Random full-batch reset state with drawn tracking references, plus
    its observations.  Jit-compatible; returns ``(obs, state)``."""
    k_env, k_ref = jax.random.split(key)
    _, state = env.vmap_reset(jax.random.split(k_env, env.batch_size))
    state = draw_references(env, state, k_ref)
    obs = jax.vmap(env.generate_observation, in_axes=(0, env.in_axes_env_properties))(
        state, env.env_properties
    )
    return obs, state
