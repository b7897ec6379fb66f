"""Regression: ``sim_ahead`` must work on states produced by a *keyed* reset.

The reference breaks here (``jnp.full(obs_len, PRNGKey)`` and stacking of
ragged state leaves both fail once the PRNGKey leaf has shape (2,)); this
framework time-tiles and indexes state pytrees per-leaf instead.
"""

import jax
import jax.numpy as jnp
import pytest
from jax.tree_util import tree_structure

from exciting_environments_tpu import EnvironmentRegistry

envs_to_test = list(EnvironmentRegistry)


@pytest.mark.parametrize("env_type", envs_to_test)
def test_sim_ahead_after_keyed_reset(env_type):
    batch_size = 4
    env = env_type.make(batch_size=batch_size)
    keys = jax.random.split(jax.random.PRNGKey(99), batch_size)
    obs, state = env.vmap_reset(keys)

    acts = 0.5 * jnp.ones((batch_size, 6, env.action_dim))
    obs, states, last_state = env.vmap_sim_ahead(state, acts, env.tau, env.tau)
    assert obs.shape == (batch_size, 7, len(env.obs_description))
    assert tree_structure(last_state) == tree_structure(state)
    assert last_state.PRNGKey.shape == state.PRNGKey.shape

    rew, trunc, term = env.vmap_generate_rew_trunc_term_ahead(states, acts)
    assert rew.shape[0] == batch_size
