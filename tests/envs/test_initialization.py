"""Default / custom initialization pinning tests.

Defaults are pinned literally so accidental changes fail (reference pattern:
``/root/reference/tests/envs/pendulum/test_pendulum.py:16-129``); the custom
cases verify that per-batch array parameters mixed with scalars are accepted
and stored unchanged (heterogeneous batching).
"""

import jax.numpy as jnp
import pytest

from exciting_environments_tpu import EnvironmentRegistry, MotorVariant
from exciting_environments_tpu.utils import MinMaxNormalization

BATCH = 4


def _assert_equal(actual, expected, what):
    if isinstance(expected, jnp.ndarray) or isinstance(actual, jnp.ndarray):
        assert jnp.array_equal(actual, expected), f"{what}: {actual} != {expected}"
    else:
        assert actual == expected, f"{what}: {actual} != {expected}"


def _check_env(env, params, physical_normalizations, action_normalizations):
    for key, value in params.items():
        _assert_equal(getattr(env.env_properties.static_params, key), value, f"param {key}")
    for key, norm in physical_normalizations.items():
        env_norm = getattr(env.env_properties.physical_normalizations, key)
        _assert_equal(env_norm.min, norm.min, f"physical_normalization {key}.min")
        _assert_equal(env_norm.max, norm.max, f"physical_normalization {key}.max")
    for key, norm in action_normalizations.items():
        env_norm = getattr(env.env_properties.action_normalizations, key)
        _assert_equal(env_norm.min, norm.min, f"action_normalization {key}.min")
        _assert_equal(env_norm.max, norm.max, f"action_normalization {key}.max")


# pinned defaults: (registry entry, static params, physical norms, action norms)
DEFAULT_CASES = [
    (
        EnvironmentRegistry.PENDULUM,
        {"g": 9.81, "l": 2, "m": 1},
        {
            "theta": MinMaxNormalization(min=-jnp.pi, max=jnp.pi),
            "omega": MinMaxNormalization(min=-10, max=10),
        },
        {"torque": MinMaxNormalization(min=-20, max=20)},
    ),
    (
        EnvironmentRegistry.CART_POLE,
        {"mu_p": 0.000002, "mu_c": 0.0005, "l": 0.5, "m_p": 0.1, "m_c": 1, "g": 9.81},
        {
            "deflection": MinMaxNormalization(min=-2.4, max=2.4),
            "velocity": MinMaxNormalization(min=-8, max=8),
            "theta": MinMaxNormalization(min=-jnp.pi, max=jnp.pi),
            "omega": MinMaxNormalization(min=-8, max=8),
        },
        {"force": MinMaxNormalization(min=-20, max=20)},
    ),
    (
        EnvironmentRegistry.ACROBOT,
        {"g": 9.81, "l_1": 2, "l_2": 2, "m_1": 1, "m_2": 1, "l_c1": 1, "l_c2": 1, "I_1": 1.3, "I_2": 1.3},
        {
            "theta_1": MinMaxNormalization(min=-jnp.pi, max=jnp.pi),
            "theta_2": MinMaxNormalization(min=-jnp.pi, max=jnp.pi),
            "omega_1": MinMaxNormalization(min=-10, max=10),
            "omega_2": MinMaxNormalization(min=-10, max=10),
        },
        {"torque": MinMaxNormalization(min=-20, max=20)},
    ),
    (
        EnvironmentRegistry.MASS_SPRING_DAMPER,
        {"k": 100, "d": 1, "m": 1},
        {
            "deflection": MinMaxNormalization(min=-10, max=10),
            "velocity": MinMaxNormalization(min=-10, max=10),
        },
        {"force": MinMaxNormalization(min=-20, max=20)},
    ),
    (
        EnvironmentRegistry.FLUID_TANK,
        {"base_area": jnp.pi, "orifice_area": jnp.pi * 0.1**2, "c_d": 0.6, "g": 9.81},
        {"height": MinMaxNormalization(min=0, max=3)},
        {"inflow": MinMaxNormalization(min=0, max=0.2)},
    ),
]


@pytest.mark.parametrize("env_type,params,phys,act", DEFAULT_CASES, ids=[c[0].value for c in DEFAULT_CASES])
def test_default_initialization(env_type, params, phys, act):
    env = env_type.make(batch_size=BATCH)
    _check_env(env, params, phys, act)


@pytest.mark.parametrize("motor_variant", list(MotorVariant))
def test_pmsm_default_initialization(motor_variant):
    motor_params = motor_variant.get_params()
    env = EnvironmentRegistry.PMSM.make(motor_variant=motor_variant)
    _check_env(
        env,
        motor_params.static_params.__dict__,
        motor_params.physical_normalizations.__dict__,
        motor_params.action_normalizations.__dict__,
    )


def test_custom_initialization_pendulum():
    physical_normalizations = {
        "theta": MinMaxNormalization(min=jnp.repeat(-jnp.pi / 2, BATCH), max=jnp.pi / 2),
        "omega": MinMaxNormalization(min=-5, max=3),
    }
    action_normalizations = {"torque": MinMaxNormalization(min=-10, max=10)}
    params = {"l": jnp.repeat(1, BATCH), "g": 9.81, "m": 1}
    env = EnvironmentRegistry.PENDULUM.make(
        batch_size=BATCH,
        static_params=params,
        physical_normalizations=physical_normalizations,
        action_normalizations=action_normalizations,
    )
    _check_env(env, params, physical_normalizations, action_normalizations)
    # per-batch leaves are mapped along axis 0, scalars broadcast
    assert env.in_axes_env_properties.physical_normalizations.theta.min == 0
    assert env.in_axes_env_properties.physical_normalizations.theta.max is None
    assert env.in_axes_env_properties.static_params.l == 0
    assert env.in_axes_env_properties.static_params.g is None


def test_custom_initialization_pmsm():
    physical_normalizations = {
        "u_d_buffer": MinMaxNormalization(min=(-2 * 350 / 3), max=(2 * 26 / 3)),
        "u_q_buffer": MinMaxNormalization(min=(-2 * 320 / 3), max=(2 * 300 / 3)),
        "epsilon": MinMaxNormalization(min=jnp.repeat((-jnp.pi / 2), BATCH), max=(jnp.pi)),
        "i_d": MinMaxNormalization(min=(-30), max=(0)),
        "i_q": MinMaxNormalization(min=(-20), max=(250)),
        "omega_el": MinMaxNormalization(min=4, max=(3 * 1100 * 2 * jnp.pi / 60)),
        "torque": MinMaxNormalization(min=(-200), max=(2030)),
    }
    action_normalizations = {
        "u_d": MinMaxNormalization(min=(-2 * 350 / 3), max=(2 * 26 / 3)),
        "u_q": MinMaxNormalization(min=(-2 * 320 / 3), max=(2 * 300 / 3)),
    }
    params = {
        "p": jnp.repeat(3, BATCH),
        "r_s": 15e-3,
        "l_d": 0.37e-3,
        "l_q": 1.2e-3,
        "psi_p": 65.6e-3,
        "u_dc": 400,
        "deadtime": 1,
    }
    env = EnvironmentRegistry.PMSM.make(
        batch_size=BATCH,
        static_params=params,
        physical_normalizations=physical_normalizations,
        action_normalizations=action_normalizations,
    )
    _check_env(env, params, physical_normalizations, action_normalizations)


def test_heterogeneous_batch_step():
    """Per-batch parameters actually change the dynamics per batch entry."""
    lengths = jnp.array([1.0, 2.0, 3.0, 4.0])
    env = EnvironmentRegistry.PENDULUM.make(batch_size=4, static_params={"l": lengths, "g": 9.81, "m": 1})
    obs, state = env.vmap_reset()
    obs, state = env.vmap_step(state, 0.5 * jnp.ones((4, 1)))
    omega = state.physical_state.omega
    assert len(set(float(o) for o in omega)) == 4, "per-batch length must yield distinct dynamics"
