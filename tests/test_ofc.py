"""Output-feedback MPPI (utils/ofc.py): the stochastic plant + EKF + planner
composition controls from noisy partial measurements, beats the zero policy,
and its belief beats the raw sensor. Validation guards included.

The tracking problem mirrors ``test_mpc._rest_tracking_state``: pendulum at
rest with statically feasible reference angles — random initial omega
(uniform ±10 rad/s) exceeds what max torque can arrest inside a short
horizon, which would test swing-up, not output-feedback control."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.core import structures
from exciting_environments_tpu.utils import mpc, ofc
from exciting_environments_tpu.utils.episodes import reset_with_references

B = 4
TAU = 2e-2
SIGMA = 0.08
N_STEPS = 50
CFG = mpc.MPPIConfig(horizon=20, n_samples=128, temperature=0.02,
                     noise_sigma=0.5, n_iterations=2, smoothing=0.5)


def _setup():
    plant = excenvs.Pendulum(
        batch_size=B, tau=TAU, control_state=["theta"],
        observation_noise={"theta": SIGMA},
    )
    model = excenvs.Pendulum(batch_size=B, tau=TAU, control_state=["theta"])
    _, state = jax.jit(lambda k: reset_with_references(plant, k))(jax.random.PRNGKey(4))
    with structures.copy_and_mutate(state, validate=False) as state:
        state.physical_state.theta = jnp.zeros(B)
        state.physical_state.omega = jnp.zeros(B)
        state.reference.theta = jnp.linspace(-0.9, 0.9, B)
    # belief seeded at the (known) rest state
    x0 = jnp.zeros((B, 2))
    return plant, model, state, x0


def _run(plant, model, state, x0, cfg, key=1):
    return ofc.run_output_feedback_mppi(
        plant, model, state, N_STEPS, jax.random.PRNGKey(key), cfg,
        measured_fields=("theta",), process_std={"omega": 0.05}, x0=x0,
    )


@pytest.fixture(scope="module")
def ofc_case():
    plant, model, state, x0 = _setup()
    return plant, model, state, x0, _run(plant, model, state, x0, CFG)


def test_shapes_and_feasibility(ofc_case):
    plant, model, state, x0, res = ofc_case
    assert res.observations.shape == (B, N_STEPS, len(plant.obs_description))
    assert res.actions.shape == (B, N_STEPS, 1)
    assert res.rewards.shape == (B, N_STEPS)
    assert res.belief_means.shape == (B, N_STEPS, 2)
    assert res.belief_covs.shape == (B, N_STEPS, 2, 2)
    assert res.nll.shape == (B,)
    for leaf in [res.observations, res.actions, res.rewards, res.belief_means, res.nll]:
        assert np.isfinite(np.asarray(leaf)).all()
    assert bool((jnp.abs(res.actions) <= 1.0).all())


def test_tracks_from_noisy_partial_measurements(ofc_case):
    plant, model, state, x0, res = ofc_case
    # zero policy through the identical loop (n_iterations=0 leaves the zero
    # warm-start plan untouched; same plant noise stream structure)
    res0 = _run(plant, model, state, x0, CFG._replace(n_iterations=0))
    r_ofc = float(res.rewards.mean())
    r_zero = float(res0.rewards.mean())
    assert r_ofc > r_zero + 0.1, (r_ofc, r_zero)
    # the second half of the run holds near the reference despite never
    # seeing the true state
    assert float(res.rewards[:, N_STEPS // 2:].mean()) > -0.2


def test_belief_beats_raw_sensor_and_reconstructs_omega(ofc_case):
    plant, model, state, x0, res = ofc_case
    # observation noise only: the true trajectory is the deterministic model
    # replay of the applied actions from the same initial state
    true_obs, _ = model.vmap_rollout(state, res.actions)
    true_obs = np.asarray(true_obs)
    means = np.asarray(res.belief_means)
    meas = np.asarray(res.observations)

    def circ_rmse(a, b):
        d = a - b
        d = d - 2.0 * np.round(d / 2.0)
        return float(np.sqrt(np.mean(d**2)))

    raw = circ_rmse(meas[:, :, 0], true_obs[:, :, 0])
    filt = circ_rmse(means[:, :, 0], true_obs[:, :, 0])
    assert filt < 0.8 * raw, (filt, raw)
    omega_rmse = float(np.sqrt(np.mean((means[:, :, 1] - true_obs[:, :, 1]) ** 2)))
    assert omega_rmse < 0.1, omega_rmse


def test_validation_guards():
    plant, model, state, x0 = _setup()
    noisy_model = excenvs.Pendulum(
        batch_size=B, tau=TAU, control_state=["theta"],
        observation_noise={"theta": SIGMA},
    )
    with pytest.raises(ValueError, match="deterministic twin"):
        ofc.run_output_feedback_mppi(plant, noisy_model, state, 2)
    small = excenvs.Pendulum(batch_size=2, tau=TAU, control_state=["theta"])
    with pytest.raises(ValueError, match="batch_size"):
        ofc.run_output_feedback_mppi(plant, small, state, 2)
    with pytest.raises(ValueError, match="batched x0"):
        ofc.run_output_feedback_mppi(plant, model, state, 2, x0=jnp.zeros((B, 5)))
    coarse = excenvs.Pendulum(batch_size=B, tau=TAU * 10, control_state=["theta"])
    with pytest.raises(ValueError, match="tau"):
        ofc.run_output_feedback_mppi(plant, coarse, state, 2)
    narrow = excenvs.Pendulum(
        batch_size=B, tau=TAU, control_state=["theta"],
        physical_normalizations={"theta": excenvs.MinMaxNormalization(-jnp.pi, jnp.pi),
                                 "omega": excenvs.MinMaxNormalization(-5, 5)},
    )
    with pytest.raises(ValueError, match="physical_normalizations"):
        ofc.run_output_feedback_mppi(plant, narrow, state, 2)


def test_output_feedback_on_pmsm_drive():
    """The capstone composition on the drive: stochastic PMSM plant (noisy
    current sensors) + EKF current observer (transition includes the inverter
    constraint and deadtime buffer) + MPPI current control from the belief
    mean — tracks dq current references it never measures exactly."""
    from exciting_environments_tpu.utils.episodes import reset_with_references

    B_ = 4
    kw = dict(batch_size=B_, control_state=["i_d", "i_q"], tau=1e-4)
    plant = excenvs.PMSM(observation_noise={"i_d": 8.0, "i_q": 8.0}, **kw)
    model = excenvs.PMSM(**kw)
    _, state = jax.jit(lambda k: reset_with_references(plant, k))(jax.random.PRNGKey(5))
    cfg = mpc.MPPIConfig(horizon=8, n_samples=32, temperature=0.02,
                         noise_sigma=0.3, n_iterations=1, smoothing=0.3)

    def run(c):
        return ofc.run_output_feedback_mppi(
            plant, model, state, 40, jax.random.PRNGKey(6), c,
            measured_fields=("i_d", "i_q", "omega_el"),
            process_std={"i_d": 1.0, "i_q": 1.0},
        )

    res = run(cfg)
    assert res.belief_means.shape == (B_, 40, 7)
    for leaf in [res.observations, res.actions, res.rewards, res.belief_means, res.nll]:
        assert np.isfinite(np.asarray(leaf)).all()

    # beats the zero plan through the identical loop...
    res0 = run(cfg._replace(n_iterations=0))
    assert float(res.rewards.mean()) > float(res0.rewards.mean()) + 0.5
    # ...and settles near the reference despite never seeing the true state
    assert float(res.rewards[:, 20:].mean()) > -0.1
