"""GymWrapper tests (reference ``/root/reference/tests/test_gym_wrapper.py``)."""

import jax
import jax.numpy as jnp
import pytest

import exciting_environments_tpu as excenvs
from exciting_environments_tpu import EnvironmentRegistry

envs_to_test = list(EnvironmentRegistry)


@pytest.mark.parametrize("env_type", envs_to_test)
def test_step_returns_correct_outputs(env_type):
    """GymWrapper step must agree with the raw vmap_step observation."""
    env = env_type.make(batch_size=4)
    gym_env = excenvs.GymWrapper(env=env)

    action = jnp.ones((env.batch_size, env.action_dim))

    _, state = env.vmap_reset()
    new_obs, state = env.vmap_step(state, action)

    _ = gym_env.reset()
    new_obs_gym, reward, terminated, truncated = gym_env.step(action)

    assert jnp.array_equal(new_obs, new_obs_gym)
    assert reward.shape == (4, 1)
    assert terminated.shape == (4, 1)


@pytest.mark.slow
@pytest.mark.parametrize("env_type", envs_to_test)
def test_gym_wrapper_ref_generation(env_type):
    env = env_type.make(batch_size=4)
    gym_env = excenvs.GymWrapper(env=env)
    rng_env = jax.vmap(jax.random.PRNGKey)(jnp.array([0, 1, 2, 3]))
    rng_ref = jax.vmap(jax.random.PRNGKey)(jnp.array([0, 1, 2, 3]))
    obs, _ = gym_env.reset(rng_env=rng_env, rng_ref=rng_ref)

    assert gym_env.ref_gen == True
    assert gym_env.reference_hold_steps.shape == (gym_env.env.batch_size, 1)


def test_from_env_factory():
    gym_env = excenvs.GymWrapper.from_env(EnvironmentRegistry.PENDULUM, batch_size=3)
    assert gym_env.env.batch_size == 3


def test_reference_tracking_loop():
    """With a control state and reference generation on, the wrapper runs a
    closed loop and rewards are finite."""
    env = EnvironmentRegistry.PENDULUM.make(batch_size=4)
    gym_env = excenvs.GymWrapper(env=env, control_state=["theta"])
    rng_ref = jax.random.PRNGKey(7)
    obs, _ = gym_env.reset(rng_ref=rng_ref)
    assert obs.shape == (4, 3)  # theta, omega, theta_ref
    for _ in range(5):
        obs, reward, terminated, truncated = gym_env.step(jnp.zeros((4, 1)))
    assert jnp.all(jnp.isfinite(reward))
    assert reward.shape == (4, 1)


def test_custom_ref_params():
    """User-provided ref_params must be honored (the reference silently
    dropped them: gym_wrapper.py:44-48 only sets defaults)."""
    env = EnvironmentRegistry.PENDULUM.make(batch_size=4)
    gym_env = excenvs.GymWrapper(
        env=env, control_state=["theta"], ref_params={"hold_steps_min": 2, "hold_steps_max": 5}
    )
    assert gym_env.ref_params == {"hold_steps_min": 2, "hold_steps_max": 5}
    obs, _ = gym_env.reset(rng_ref=jax.random.PRNGKey(3))
    assert bool((gym_env.reference_hold_steps >= 2).all())
    assert bool((gym_env.reference_hold_steps < 5).all())


def test_ref_generation_enabled_after_first_step():
    """Enabling reference generation after the wrapper has already stepped
    must retrace (the reference wrapper silently reuses the stale no-ref
    executable here)."""
    env = EnvironmentRegistry.PENDULUM.make(batch_size=4)
    gym_env = excenvs.GymWrapper(env=env, control_state=["theta"])
    gym_env.reset()  # no rng_ref: generation off
    gym_env.step(jnp.zeros((4, 1)))  # traces with ref_active=False

    gym_env.reset(rng_ref=jax.random.PRNGKey(1))
    hold0 = gym_env.reference_hold_steps.copy()
    gym_env.step(jnp.zeros((4, 1)))
    # with generation active, the hold counter must decrement
    assert bool((gym_env.reference_hold_steps == hold0 - 1).all())


def test_reset_with_initial_state():
    """Resetting to a caller-provided flattened state restores it exactly."""
    from jax.tree_util import tree_flatten

    env = EnvironmentRegistry.MASS_SPRING_DAMPER.make(batch_size=3)
    gym_env = excenvs.GymWrapper(env=env)
    for _ in range(5):
        gym_env.step(0.7 * jnp.ones((3, 1)))
    saved = [leaf.copy() for leaf in gym_env.state]

    gym_env.step(0.7 * jnp.ones((3, 1)))  # move away
    obs, _ = gym_env.reset(initial_state=saved)
    for a, b in zip(gym_env.state, saved):
        assert jnp.array_equal(a, b, equal_nan=True)  # reference/PRNG leaves are NaN


def test_custom_reward_function():
    """User-supplied reward/terminated/truncated functions replace the env's."""
    env = EnvironmentRegistry.PENDULUM.make(batch_size=2)

    def my_reward(state, action, env_properties):
        return jnp.array([42.0])

    gym_env = excenvs.GymWrapper(env=env, generate_reward=my_reward)
    gym_env.reset()
    obs, reward, terminated, truncated = gym_env.step(jnp.zeros((2, 1)))
    assert bool((reward == 42.0).all())
