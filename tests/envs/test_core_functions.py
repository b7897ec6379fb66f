"""Generic environment contract tests, parametrized over the full registry.

Mirrors the reference's contract suite
(``/root/reference/tests/envs/test_core_functions.py``): constructor
passthrough, reset shapes, observation<->state bijection, step/sim_ahead
shape stability, and Euler step-loop == sim_ahead consistency.
"""

import jax
import jax.numpy as jnp
import pytest
from jax.tree_util import tree_structure

from exciting_environments_tpu import EnvironmentRegistry

envs_to_test = list(EnvironmentRegistry)


@pytest.mark.parametrize("env_type", envs_to_test)
@pytest.mark.parametrize("tau", [1e-4, 1e-5])
def test_tau(env_type, tau):
    env = env_type.make(tau=tau)
    assert env.tau == tau


@pytest.mark.parametrize("env_type", envs_to_test)
def test_reset(env_type):
    batch_size = 4
    env = env_type.make(batch_size=batch_size)
    key = jax.random.PRNGKey(seed=1234)
    keys = jax.random.split(key, num=batch_size)

    # single
    obs, state = env.reset(env.env_properties, keys[0])
    assert obs.shape == env.obs_description.shape
    assert type(state) == env.State
    obs, state = env.reset(env.env_properties)
    assert obs.shape == env.obs_description.shape
    assert type(state) == env.State

    # batched
    obs, state = env.vmap_reset(keys)
    assert obs.shape == (env.batch_size, len(env.obs_description))
    assert type(state) == env.State
    obs, state = env.vmap_reset()
    assert obs.shape == (env.batch_size, len(env.obs_description))
    assert type(state) == env.State


@pytest.mark.parametrize("env_type", envs_to_test)
def test_gen_observation_gen_state(env_type):
    batch_size = 4
    env = env_type.make(batch_size=batch_size)

    # single: obs -> state -> obs must be the identity
    obs, state = env.reset(env.env_properties)
    assert jnp.array_equal(obs, env.generate_observation(state, env.env_properties))
    assert jnp.array_equal(
        obs,
        env.generate_observation(
            env.generate_state_from_observation(obs, env.env_properties), env.env_properties
        ),
    )

    # batched
    obs, state = env.vmap_reset()
    assert jnp.array_equal(
        obs,
        jax.vmap(env.generate_observation, in_axes=(0, env.in_axes_env_properties))(
            state, env.env_properties
        ),
    )
    assert jnp.array_equal(
        obs,
        jax.vmap(env.generate_observation, in_axes=(0, env.in_axes_env_properties))(
            env.vmap_generate_state_from_observation(obs), env.env_properties
        ),
    )


@pytest.mark.parametrize("env_type", envs_to_test)
def test_step(env_type):
    batch_size = 4
    env = env_type.make(batch_size=batch_size)

    # single
    init_obs, state = env.reset(env.env_properties)
    init_state_struct = tree_structure(state)
    for _ in range(100):
        action = jnp.ones(env.action_dim)
        obs, state = env.step(state, action, env.env_properties)
    assert init_obs.shape == obs.shape
    assert init_state_struct == tree_structure(state)

    # batched
    init_obs, state = env.vmap_reset()
    init_state_struct = tree_structure(state)
    for _ in range(100):
        action = jnp.ones((env.batch_size, env.action_dim))
        obs, state = env.vmap_step(state, action)
    assert init_obs.shape == obs.shape
    assert init_state_struct == tree_structure(state)


@pytest.mark.parametrize("env_type", envs_to_test)
def test_simulate_ahead(env_type):
    sim_steps = 10
    batch_size = 4
    env = env_type.make(batch_size=batch_size)

    # single
    obs, init_state = env.reset(env.env_properties)
    acts = jnp.ones((sim_steps, env.action_dim))
    obs, states, last_state = env.sim_ahead(init_state, acts, env.env_properties, env.tau, env.tau)
    assert obs.shape == ((sim_steps + 1), len(env.obs_description))
    assert tree_structure(init_state) == tree_structure(last_state)

    # batched
    obs, init_state = env.vmap_reset()
    acts = jnp.ones((batch_size, sim_steps, env.action_dim))
    obs, states, last_state = env.vmap_sim_ahead(init_state, acts, env.tau, env.tau)
    assert obs.shape == (batch_size, (sim_steps + 1), len(env.obs_description))
    assert tree_structure(init_state) == tree_structure(last_state)


@pytest.mark.parametrize("env_type", envs_to_test)
def test_similarity_step_sim_ahead_results(env_type):
    sim_steps = 10
    batch_size = 4
    env = env_type.make(batch_size=batch_size, solver="euler")

    obs, state = env.reset(env.env_properties)
    acts = jnp.ones((sim_steps, env.action_dim))

    obs_ahead, states_ahead, last_state_ahead = env.sim_ahead(
        state, acts, env.env_properties, env.tau, env.tau
    )
    last_obs_ahead = env.generate_observation(last_state_ahead, env.env_properties)

    for _ in range(sim_steps):
        action = jnp.ones(env.action_dim)
        obs_step, state = env.step(state, action, env.env_properties)

    assert jnp.allclose(last_obs_ahead, obs_step, 1e-16), (
        "Simulate ahead and stepwise simulation deviate for the Euler solver."
    )
