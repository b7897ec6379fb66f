"""sim_ahead semantics: observation sampling finer than the action grid.

The solver steps at ``obs_stepsize`` while actions are zero-order-hold over
``action_stepsize`` (reference ``core_env.py:427-488``); with
``action_stepsize = 2 * obs_stepsize`` each action must drive exactly two
solver steps.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import exciting_environments_tpu as excenvs


def test_fine_observation_sampling_matches_manual_euler():
    env = excenvs.MassSpringDamper(batch_size=1, tau=1e-3)
    obs0, state = env.reset(env.env_properties)
    n_actions = 5
    actions_norm = jnp.linspace(-0.5, 0.5, n_actions).reshape(n_actions, 1)

    obs_step = env.tau
    act_step = 2 * env.tau
    obs, states, last = env.sim_ahead(state, actions_norm, env.env_properties, obs_step, act_step)
    assert obs.shape == (2 * n_actions + 1, 2)

    # manual Euler: each denormalized action held for two tau-steps
    d = float(env.env_properties.static_params.d)
    k = float(env.env_properties.static_params.k)
    m = float(env.env_properties.static_params.m)
    x = float(state.physical_state.deflection)
    v = float(state.physical_state.velocity)
    traj = [(x, v)]
    for i in range(n_actions):
        u = float(env.denormalize_action(actions_norm[i], env.env_properties)[0])
        for _ in range(2):
            x, v = x + env.tau * v, v + env.tau * (u - d * v - k * x) / m
            traj.append((x, v))
    traj = np.array(traj)

    np.testing.assert_allclose(
        np.asarray(states.physical_state.deflection), traj[:, 0], rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(states.physical_state.velocity), traj[:, 1], rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(float(last.physical_state.deflection), traj[-1, 0], rtol=1e-6)


def test_obs_stepsize_gt_action_stepsize_rejected():
    env = excenvs.MassSpringDamper(batch_size=2)
    _, state = env.vmap_reset()
    with pytest.raises(AssertionError, match="greater or equal"):
        env.vmap_sim_ahead(state, jnp.ones((2, 4, 1)), 2 * env.tau, env.tau)
