"""End-to-end differentiability of the simulation (a capability the pure-JAX
design gives for free and that the reference never exposes): gradients flow
through full rollouts and trajectory solves w.r.t. actions, enabling
gradient-based excitation design and optimal control."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import exciting_environments_tpu as excenvs


def test_grad_matches_finite_differences():
    env = excenvs.MassSpringDamper(batch_size=1, tau=1e-2)
    _, state = env.reset(env.env_properties), None
    obs, state = env.vmap_reset()

    def loss(actions):
        _, last = env.vmap_rollout(state, actions, actions.shape[1])
        return jnp.sum(last.physical_state.deflection ** 2)

    actions = 0.3 * jnp.ones((1, 8, 1))
    g = jax.grad(loss)(actions)

    eps = 1e-6
    for t in [0, 3, 7]:
        ap = actions.at[0, t, 0].add(eps)
        am = actions.at[0, t, 0].add(-eps)
        fd = (loss(ap) - loss(am)) / (2 * eps)
        np.testing.assert_allclose(float(g[0, t, 0]), float(fd), rtol=1e-4)


def test_gradient_based_control_improves():
    env = excenvs.Pendulum(batch_size=4, tau=2e-2)
    _, state = env.vmap_reset()

    def loss(actions):
        _, last = env.vmap_rollout(state, actions, actions.shape[1])
        return jnp.mean(last.physical_state.theta ** 2)

    actions = 0.1 * jnp.ones((4, 50, 1))
    before = float(loss(actions))
    a = actions
    grad_fn = jax.jit(jax.grad(loss))
    for _ in range(25):
        a = a - 2.0 * grad_fn(a)
    after = float(loss(a))
    assert after < 0.05 * before, f"gradient control did not improve: {before} -> {after}"


def test_grad_through_sim_ahead_and_pmsm():
    env = excenvs.Pendulum(batch_size=2, tau=1e-2)
    _, state = env.vmap_reset()

    def loss(actions):
        obs, states, last = env.vmap_sim_ahead(state, actions, env.tau, env.tau)
        return jnp.mean(obs[:, -1, :] ** 2)

    g = jax.grad(loss)(0.2 * jnp.ones((2, 10, 1)))
    assert bool(jnp.isfinite(g).all())

    pmsm = excenvs.PMSM(batch_size=2)
    _, ps = pmsm.vmap_reset()

    def loss_pmsm(acts):
        _, last = pmsm.vmap_rollout(ps, acts, acts.shape[1])
        return jnp.mean((last.physical_state.i_q - 20.0) ** 2)

    g2 = jax.grad(loss_pmsm)(0.05 * jnp.ones((2, 12, 2)))
    assert bool(jnp.isfinite(g2).all()) and float(jnp.linalg.norm(g2)) > 0


def test_parameter_gradient_system_identification():
    """Gradients w.r.t. physical parameters enable system identification:
    recover the spring constant from observed trajectories by gradient
    descent (the functional API takes env_properties as an argument, so any
    leaf can be a differentiation target)."""
    from exciting_environments_tpu.core import structures

    true_env = excenvs.MassSpringDamper(batch_size=4, tau=1e-2)
    _, s0 = true_env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), 4))
    actions = jax.random.uniform(jax.random.PRNGKey(1), (4, 60, 1), minval=-1, maxval=1)
    obs_data, _ = true_env.vmap_rollout(s0, actions)  # ground truth, k = 100

    env = true_env

    def rollout_with_k(k):
        props = structures.replace(
            env.env_properties,
            static_params=structures.replace(env.env_properties.static_params, k=k),
        )

        def body(state, a_t):
            obs, state = jax.vmap(env.step, in_axes=(0, 0, None))(state, a_t, props)
            return state, obs

        _, obs = jax.lax.scan(body, s0, jnp.swapaxes(actions, 0, 1))
        return jnp.swapaxes(obs, 0, 1)

    def loss(k):
        return jnp.mean((rollout_with_k(k) - obs_data) ** 2)

    k = 60.0
    value_and_grad = jax.jit(jax.value_and_grad(loss))
    for _ in range(100):
        l, g = value_and_grad(k)
        k = k - 120.0 * g
    assert abs(float(k) - 100.0) < 0.5, f"identified k = {float(k)}"
    assert float(l) < 1e-4
