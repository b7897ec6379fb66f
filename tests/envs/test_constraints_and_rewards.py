"""Soft-constraint functions and the PMSM reward family.

These surfaces exist in the reference but are untested there; pinned here so
behavior changes are deliberate.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.core import structures


@pytest.mark.parametrize(
    "env_cls,constrained",
    [
        (excenvs.Pendulum, {"omega"}),
        (excenvs.CartPole, {"deflection", "velocity", "omega"}),
        (excenvs.Acrobot, {"omega_1", "omega_2"}),
        (excenvs.MassSpringDamper, {"deflection", "velocity"}),
        (excenvs.FluidTank, set()),
    ],
    ids=lambda v: v.__name__ if isinstance(v, type) else str(sorted(v)),
)
def test_default_soft_constraints(env_cls, constrained):
    env = env_cls(batch_size=2)
    obs, state = env.reset(env.env_properties)
    single = jax.tree_util.tree_map(lambda x: x, state)
    action = 1.5 * jnp.ones(env.action_dim)  # outside the normalized band

    phys_sc, act_sc = env.soft_constraints(single, action, env.env_properties)
    for f in structures.fields(phys_sc):
        v = getattr(phys_sc, f.name)
        if f.name in constrained:
            assert not bool(jnp.isnan(v)), f"{f.name} should be constrained"
            assert float(v) >= 0.0
        else:
            assert bool(jnp.isnan(jnp.asarray(v).astype(float))), f"{f.name} should be NaN"
    # |action| = 1.5 -> ReLU(|a|-1) = 0.5
    np.testing.assert_allclose(np.asarray(act_sc), 0.5, atol=1e-6)


def test_pmsm_soft_constraints_all_fields():
    env = excenvs.PMSM(batch_size=2)
    obs, state = env.reset(env.env_properties)
    phys_sc, act_sc = env.soft_constraints(state, jnp.zeros(2), env.env_properties)
    for f in structures.fields(phys_sc):
        v = jnp.asarray(getattr(phys_sc, f.name)).astype(float)
        assert bool(jnp.isfinite(v)), f"{f.name} constraint must be finite"
        assert float(v) >= 0.0
    assert act_sc is None  # PMSM's preset returns no action constraint


def _pmsm_state_with_refs(env, i_d, i_q, torque, i_d_ref, i_q_ref, torque_ref):
    _, state = env.reset(env.env_properties)
    phys = structures.replace(
        state.physical_state, i_d=jnp.asarray(i_d), i_q=jnp.asarray(i_q), torque=jnp.asarray(torque)
    )
    ref = structures.replace(
        state.reference,
        i_d=jnp.asarray(i_d_ref),
        i_q=jnp.asarray(i_q_ref),
        torque=jnp.asarray(torque_ref),
    )
    return structures.replace(state, physical_state=phys, reference=ref)


def test_pmsm_current_reward():
    env = excenvs.PMSM(batch_size=1, control_state=["i_d", "i_q"])
    # perfect tracking -> reward 0
    s = _pmsm_state_with_refs(env, -100.0, 50.0, 0.0, -100.0, 50.0, jnp.nan)
    r = env.generate_reward(s, jnp.zeros(2), env.env_properties)
    np.testing.assert_allclose(float(r[0]), 0.0, atol=1e-12)
    # tracking error -> negative, scaled by (1 - gamma) = 0.15
    s2 = _pmsm_state_with_refs(env, -100.0, 50.0, 0.0, -100.0, -75.0, jnp.nan)
    r2 = env.generate_reward(s2, jnp.zeros(2), env.env_properties)
    # normalized i_q error: (50 - (-75)) / 250 = 0.5 -> mse = 0.5*0.25
    np.testing.assert_allclose(float(r2[0]), -0.15 * 0.5 * 0.25, rtol=1e-6)


def test_pmsm_torque_reward_regimes():
    env = excenvs.PMSM(batch_size=1, control_state=["torque"])
    # overcurrent regime: |i| > limit -> reward = -|i_s| * 0.15
    s = _pmsm_state_with_refs(env, -250.0, 250.0, 100.0, jnp.nan, jnp.nan, 100.0)
    r = env.generate_reward(s, jnp.zeros(2), env.env_properties)
    i_s = np.sqrt(1.0**2 + 1.0**2)
    np.testing.assert_allclose(float(r[0]), -i_s * 0.15, rtol=1e-6)
    # on-target low-current regime: reward = (1 - 0.5 i_s) * 0.15 > 0
    # (note the asymmetric i_d normalization [-250, 0]: -225 A -> -0.8)
    s2 = _pmsm_state_with_refs(env, -225.0, 25.0, 100.0, jnp.nan, jnp.nan, 100.0)
    r2 = env.generate_reward(s2, jnp.zeros(2), env.env_properties)
    i_s2 = np.sqrt(0.8**2 + 0.1**2)
    np.testing.assert_allclose(float(r2[0]), (1 - 0.5 * i_s2) * 0.15, rtol=1e-6)


def test_pmsm_sim_ahead_deadtime_zero_buffer_quirk():
    """With deadtime=0 the returned trajectory's buffer columns are zeroed
    (reference pmsm_env.py:788-791) — pinned as-is."""
    params = {"p": 3, "r_s": 15e-3, "l_d": 0.37e-3, "l_q": 1.2e-3,
              "psi_p": 65.6e-3, "u_dc": 400, "deadtime": 0}
    env = excenvs.PMSM(batch_size=2, static_params=params)
    _, state = env.vmap_reset()
    acts = 0.1 * jnp.ones((2, 5, 2))
    obs, states, last = env.vmap_sim_ahead(state, acts, env.tau, env.tau)
    assert bool((states.physical_state.u_d_buffer == 0).all())
    assert bool((states.physical_state.u_q_buffer == 0).all())


def test_pmsm_rew_trunc_term_ahead_with_control_state():
    env = excenvs.PMSM(batch_size=2, control_state=["i_d", "i_q"])
    _, state = env.vmap_reset()
    acts = 0.1 * jnp.ones((2, 6, 2))
    obs, states, last = env.vmap_sim_ahead(state, acts, env.tau, env.tau)
    rew, trunc, term = env.vmap_generate_rew_trunc_term_ahead(states, acts)
    assert rew.shape == (2, 6, 1)
    assert trunc.shape[0] == 2 and term.shape == (2, 6, 1)
