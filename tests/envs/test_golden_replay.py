"""Golden-file regression replays against the reference's pinned fixtures.

Each fixture directory holds ``sim_properties.json`` (static params,
normalizations, tau), ``actions.npy`` and ``observations.npy`` produced by
the reference implementation with the diffrax Euler solver in float64.  The
in-house engine must reproduce the stored observations by replaying the
action sequence step-by-step from the first stored observation — this proves
drop-in numerical compatibility (reference test pattern:
``/root/reference/tests/envs/pendulum/test_pendulum.py:132-156``).
"""

import os
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from exciting_environments_tpu import EnvironmentRegistry
from exciting_environments_tpu.utils import load_sim_properties_from_json

DATA_ROOT = Path(__file__).parent

# (registry entry, fixture dir, number of replay steps, allclose rtol)
GOLDEN_CASES = [
    (EnvironmentRegistry.PENDULUM, "pendulum", 10000, 1e-16),
    (EnvironmentRegistry.CART_POLE, "cartpole", 10000, 1e-16),
    (EnvironmentRegistry.ACROBOT, "acrobot", 10000, 1e-16),
    (EnvironmentRegistry.MASS_SPRING_DAMPER, "mass_spring_damper", 10000, 1e-16),
    (EnvironmentRegistry.FLUID_TANK, "fluid_tank", 10000, 1e-16),
    (EnvironmentRegistry.PMSM, "pmsm", 1000, 1e-8),
]


@pytest.mark.parametrize("env_type,fixture_dir,n_steps,rtol", GOLDEN_CASES, ids=[c[1] for c in GOLDEN_CASES])
def test_step_results(env_type, fixture_dir, n_steps, rtol):
    data_dir = DATA_ROOT / fixture_dir / "data"
    params, action_norms, physical_norms, tau = load_sim_properties_from_json(
        os.path.join(data_dir, "sim_properties.json")
    )
    env = env_type.make(
        tau=tau,
        solver="euler",
        static_params=params,
        physical_normalizations=physical_norms,
        action_normalizations=action_norms,
    )

    stored_observations = jnp.asarray(np.load(data_dir / "observations.npy"))
    actions_data = jnp.asarray(np.load(data_dir / "actions.npy"))

    state = env.generate_state_from_observation(stored_observations[0], env.env_properties)
    generated = [stored_observations[0]]
    for i in range(n_steps):
        obs, state = env.step(state, actions_data[i], env.env_properties)
        generated.append(obs)
    generated = jnp.array(generated)
    assert jnp.allclose(generated, stored_observations, rtol), (
        f"{fixture_dir}: replayed observations deviate from the reference fixture"
    )
