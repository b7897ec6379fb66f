"""System identification through the differentiable simulator.

No reference counterpart: the reference generates excitation data but ships no
identification machinery.  These tests pin the three capabilities of
``utils/sysid.py`` on the pendulum (whose two free parameters ``l``/``m``
enter the ODE through distinct terms — gravity ``g·sin(θ)/l`` and actuation
``u/(m·l²)`` — so both are structurally identifiable from a single excited
trajectory, reference dynamics ``pendulum_env.py:144-150``).
"""

import jax
import jax.numpy as jnp
import pytest

from exciting_environments_tpu.core import structures
from exciting_environments_tpu.models import Pendulum
from exciting_environments_tpu.ops.signals import aprbs
from exciting_environments_tpu.utils.sysid import (
    fisher_information,
    fit_parameters,
    optimize_excitation,
)

TAU = 1e-2
TRUE = {"l": 1.3, "m": 0.8}


def _env():
    return Pendulum(batch_size=4, tau=TAU)


def _true_props(env):
    sp = structures.replace(env.env_properties.static_params, **TRUE)
    return structures.replace(env.env_properties, static_params=sp)


def _experiment(env, n_steps=256, key=0):
    """One recorded trajectory from the 'true' plant under an APRBS excitation."""
    actions = aprbs(jax.random.PRNGKey(key), 1, n_steps, env.action_dim,
                    hold_min=5, hold_max=20)[0]
    props = _true_props(env)
    init_state = env.init_state(props)
    obs, _, _ = env.sim_ahead(init_state, actions, props, TAU, TAU)
    return actions, obs, init_state


@pytest.mark.slow
def test_fit_recovers_pendulum_params():
    env = _env()
    actions, observed, init_state = _experiment(env)
    result = fit_parameters(
        env, actions, observed, {"l": 1.0, "m": 1.0},
        init_state=init_state, n_starts=8, iterations=600,
    )
    assert result.final_loss < 1e-8
    for name, true in TRUE.items():
        assert abs(result.params[name] - true) / true < 1e-3, (name, result.params)
    # the winning start's recorded loss is the minimum over starts
    assert result.start_losses[result.best_start] == result.start_losses.min()
    assert result.losses.shape == (600,)
    # per-start arrays cover every start
    assert result.start_params["l"].shape == (8,)


def test_fit_seeds_init_state_from_observation():
    # without an explicit init_state the fit seeds from observed_obs[0]
    env = _env()
    actions, observed, _ = _experiment(env, n_steps=128)
    result = fit_parameters(
        env, actions, observed, {"l": 1.1, "m": 0.9},
        n_starts=4, iterations=300,
    )
    assert abs(result.params["l"] - TRUE["l"]) / TRUE["l"] < 1e-2


def test_fit_on_finer_observation_grid():
    """obs_stepsize < action_stepsize: segments index the sub-sampled grid."""
    env = _env()
    props = _true_props(env)
    actions = aprbs(jax.random.PRNGKey(3), 1, 96, 1, hold_min=5, hold_max=20)[0]
    init_state = env.init_state(props)
    obs, _, _ = env.sim_ahead(init_state, actions, props, TAU, 2 * TAU)
    assert obs.shape[0] == 2 * 96 + 1
    result = fit_parameters(
        env, actions, obs, {"l": 1.0, "m": 1.0},
        obs_stepsize=TAU, action_stepsize=2 * TAU,
        n_starts=4, iterations=300, segment_length=16,
    )
    assert result.final_loss < 1e-8
    assert abs(result.params["l"] - TRUE["l"]) / TRUE["l"] < 1e-3
    # row-count mismatch against the implied grid is rejected
    with pytest.raises(ValueError, match="rows"):
        fit_parameters(env, actions, obs[:-1], {"l": 1.0},
                       obs_stepsize=TAU, action_stepsize=2 * TAU)


def test_fit_validation_errors():
    env = _env()
    actions = jnp.zeros((8, 1))
    observed = jnp.zeros((9, 2))
    with pytest.raises(ValueError, match="unknown static parameter"):
        fit_parameters(env, actions, observed, {"length": 1.0})
    with pytest.raises(ValueError, match="strictly positive"):
        fit_parameters(env, actions, observed, {"l": -1.0})
    with pytest.raises(ValueError, match="transform"):
        fit_parameters(env, actions, observed, {"l": 1.0}, transform="sqrt")
    hetero = Pendulum(batch_size=4, static_params={"g": 9.81, "l": jnp.ones(4), "m": 1.0})
    with pytest.raises(ValueError, match="per-batch"):
        fit_parameters(hetero, actions, observed, {"l": 1.0})


def test_fisher_information_zero_for_unexciting_input():
    """θ=π, u≡0 is an equilibrium: the trajectory carries no information."""
    env = _env()
    still = fisher_information(env, jnp.zeros((64, 1)), ("l", "m"))
    excited = fisher_information(
        env, aprbs(jax.random.PRNGKey(1), 1, 64, 1, hold_min=4, hold_max=12)[0],
        ("l", "m"),
    )
    assert float(jnp.abs(still.fim).max()) < 1e-20
    # symmetric positive definite at an informative excitation
    assert jnp.allclose(excited.fim, excited.fim.T)
    assert float(jnp.linalg.det(excited.fim)) > 0
    assert float(jnp.diag(excited.crlb).min()) > 0
    assert excited.names == ("l", "m")


def test_fit_on_tracking_env_masks_reference_columns():
    """Recordings from a tracking env carry NaN reference columns (sim_ahead
    tiles the initial state's NaN reference); the default loss masks them."""
    env = Pendulum(batch_size=4, tau=TAU, control_state=["theta"])
    props = _true_props(env)
    actions = aprbs(jax.random.PRNGKey(5), 1, 128, 1, hold_min=5, hold_max=20)[0]
    obs, _, _ = env.sim_ahead(env.init_state(props), actions, props, TAU, TAU)
    assert bool(jnp.isnan(obs[:, -1]).all())  # the theta reference column
    result = fit_parameters(env, actions, obs, {"l": 1.0, "m": 1.0},
                            n_starts=4, iterations=600)
    assert jnp.isfinite(result.final_loss)
    assert abs(result.params["l"] - TRUE["l"]) / TRUE["l"] < 1e-3


def test_grid_and_shape_validation():
    env = _env()
    actions = jnp.zeros((8, 1))
    observed = jnp.zeros((9, 2))
    # observations coarser than actions / non-integer ratio are rejected upfront
    with pytest.raises(ValueError, match="must not exceed"):
        fit_parameters(env, actions, observed, {"l": 1.0},
                       obs_stepsize=2 * TAU, action_stepsize=TAU)
    with pytest.raises(ValueError, match="integer"):
        fit_parameters(env, actions, observed, {"l": 1.0},
                       obs_stepsize=0.4 * TAU, action_stepsize=TAU)
    # sequence-form free names get the same friendly errors as dict form
    with pytest.raises(ValueError, match="unknown static parameter"):
        fisher_information(env, actions, ("length",))
    hetero = Pendulum(batch_size=4, static_params={"g": 9.81, "l": jnp.ones(4), "m": 1.0})
    with pytest.raises(ValueError, match="per-batch"):
        fisher_information(hetero, actions, ("l",))
    # warm-start shape must match the requested design
    with pytest.raises(ValueError, match="init_actions shape"):
        optimize_excitation(env, ("l",), 16, init_actions=jnp.zeros((8, 1)))


@pytest.mark.slow
def test_fit_recovers_pmsm_motor_parameters():
    """Identify R_s / L_d / L_q of a linear-magnetics drive from one recorded
    current trajectory — the domain workflow the upstream project generates
    excitation data for (reference ``pmsm_env.py`` simulates, never fits)."""
    from exciting_environments_tpu.models import PMSM

    env = PMSM(batch_size=4)
    sp = env.env_properties.static_params
    true = {"r_s": float(sp.r_s) * 1.4, "l_d": float(sp.l_d) * 0.75, "l_q": float(sp.l_q) * 1.2}
    props = structures.replace(env.env_properties, static_params=structures.replace(sp, **true))
    actions = aprbs(jax.random.PRNGKey(0), 1, 256, env.action_dim, hold_min=3, hold_max=12)[0]
    init_state = env.init_state(props)
    obs, _, _ = env.sim_ahead(init_state, actions, props, env.tau, env.tau)
    guess = {"r_s": float(sp.r_s), "l_d": float(sp.l_d), "l_q": float(sp.l_q)}
    result = fit_parameters(env, actions, obs, guess,
                            n_starts=8, iterations=500, segment_length=16)
    for name, val in true.items():
        assert abs(result.params[name] - val) / val < 1e-6, (name, result.params)


def test_optimize_excitation_increases_information():
    env = _env()
    key = jax.random.PRNGKey(2)
    init_actions = 0.05 * jax.random.normal(key, (48, 1))
    before = fisher_information(env, init_actions, ("l", "m"))
    result = optimize_excitation(
        env, ("l", "m"), 48, init_actions=init_actions, iterations=40,
    )
    assert result.actions.shape == (48, 1)
    assert float(jnp.abs(result.actions).max()) <= 1.0
    # D-objective (log det FIM) strictly improved over the warm start
    gain = float(jnp.linalg.slogdet(result.fisher.fim)[1] - jnp.linalg.slogdet(before.fim)[1])
    assert gain > 1.0, gain
    assert float(result.objectives[-1]) > float(result.objectives[0])


def test_optimize_excitation_a_criterion():
    env = _env()
    result = optimize_excitation(env, ("l", "m"), 32, iterations=20, criterion="a")
    # A-objective is -trace(CRLB): monotone-ish ascent, finite throughout
    assert bool(jnp.isfinite(result.objectives).all())
    assert float(result.objectives[-1]) > float(result.objectives[0])
    with pytest.raises(ValueError, match="criterion"):
        optimize_excitation(env, ("l",), 8, criterion="e")


@pytest.mark.slow
def test_fit_is_robust_to_sensor_noise():
    """Estimator stress-test: the record comes from a stochastic plant
    (observation_noise sensor model), the fit uses the deterministic
    simulator — parameters recover to a few percent instead of 1e-3."""
    from exciting_environments_tpu.core import structures

    env = _env()
    noisy = Pendulum(
        batch_size=1, tau=TAU, static_params={"g": 9.81, **TRUE},
        observation_noise={"theta": 0.01, "omega": 0.05},
    )
    actions = aprbs(jax.random.PRNGKey(0), 1, 256, 1, hold_min=5, hold_max=20)[0]
    _, st = noisy.vmap_reset(jax.random.split(jax.random.PRNGKey(5), 1))
    obs0 = jax.vmap(
        noisy.generate_observation, in_axes=(0, noisy.in_axes_env_properties)
    )(st, noisy.env_properties)
    obs_t, _ = noisy.vmap_rollout(st, actions[None])
    observed = jnp.concatenate([obs0, obs_t[0]], axis=0)

    init_single = jax.tree_util.tree_map(lambda leaf: leaf[0], st)
    init_single = structures.replace(init_single, PRNGKey=jnp.nan)
    result = fit_parameters(
        env, actions, observed, {"l": 1.0, "m": 1.0},
        init_state=init_single, n_starts=8, iterations=600,
    )
    for name, true in TRUE.items():
        assert abs(result.params[name] - true) / true < 0.1, (name, result.params)
