"""EKF/UKF state observers (utils/estimate.py): reconstruction of unmeasured
states, improvement over raw measurements, circular angle handling, RTS
smoothing, batched dispatch, and the NLL tuning signal.

Data generation uses the stochastic-simulation constructor args; truth comes
from the matching deterministic env stepped from the identical initial state
(observation noise leaves the underlying state trajectory exact)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.utils import estimate

B = 3
T = 300
TAU = 2e-2
SIGMA_THETA = 0.08  # rad, physical units
KEYS = jax.random.split(jax.random.PRNGKey(7), B)


def _pendulum_data():
    """(noisy_env, noisy_obs, true_obs, actions) — noisy theta measurements of
    an exactly-known trajectory."""
    noisy = excenvs.Pendulum(batch_size=B, tau=TAU, observation_noise={"theta": SIGMA_THETA})
    clean = excenvs.Pendulum(batch_size=B, tau=TAU)
    st = noisy.vmap_reset(KEYS)[1]
    t = jnp.arange(T) * TAU
    actions = jnp.broadcast_to(0.3 * jnp.sin(2.0 * t)[None, :, None], (B, T, 1))
    obs_noisy, _ = noisy.vmap_rollout(st, actions)
    obs_true, _ = clean.vmap_rollout(st, actions)
    return noisy, np.asarray(obs_noisy), np.asarray(obs_true), actions


def _circ_rmse(est, true, period=2.0):
    d = est - true
    d = d - period * np.round(d / period)
    return float(np.sqrt(np.mean(d**2)))


@pytest.fixture(scope="module")
def pendulum_case():
    env, obs_noisy, obs_true, actions = _pendulum_data()
    res = estimate.run_ekf(
        env,
        obs_noisy,
        actions,
        measured_fields=("theta",),
        process_std={"omega": 0.05},
        smooth=True,
    )
    return env, obs_noisy, obs_true, actions, res


def test_ekf_beats_raw_measurement_and_recovers_omega(pendulum_case):
    env, obs_noisy, obs_true, actions, res = pendulum_case
    means = np.asarray(res.means)
    half = T // 2  # burn-in: the filter starts from an uninformative prior
    theta_meas = _circ_rmse(obs_noisy[:, half:, 0], obs_true[:, half:, 0])
    theta_filt = _circ_rmse(means[:, half:, 0], obs_true[:, half:, 0])
    omega_filt = float(np.sqrt(np.mean((means[:, half:, 1] - obs_true[:, half:, 1]) ** 2)))
    assert theta_filt < 0.7 * theta_meas, (theta_filt, theta_meas)
    # omega is never measured; the filter reconstructs it to a few percent of
    # the +-10 rad/s band
    assert omega_filt < 0.05, omega_filt
    # covariances stay symmetric PSD-ish
    covs = np.asarray(res.covs)
    assert np.allclose(covs, np.swapaxes(covs, -1, -2))
    assert (np.diagonal(covs, axis1=-2, axis2=-1) > -1e-12).all()


def test_rts_smoother_does_not_degrade(pendulum_case):
    env, obs_noisy, obs_true, actions, res = pendulum_case
    means = np.asarray(res.means)
    smoothed = np.asarray(res.smoothed_means)
    assert smoothed.shape == means.shape
    filt = _circ_rmse(means[:, :, 0], obs_true[:, :, 0])
    smth = _circ_rmse(smoothed[:, :, 0], obs_true[:, :, 0])
    assert smth <= filt * 1.02, (smth, filt)
    # the smoother fixes the uninformative start: early-window error shrinks
    early_f = _circ_rmse(means[:, :20, 0], obs_true[:, :20, 0])
    early_s = _circ_rmse(smoothed[:, :20, 0], obs_true[:, :20, 0])
    assert early_s < early_f, (early_s, early_f)


def test_ukf_agrees_with_ekf(pendulum_case):
    env, obs_noisy, obs_true, actions, res = pendulum_case
    ukf = estimate.run_ukf(
        env,
        obs_noisy,
        actions,
        measured_fields=("theta",),
        process_std={"omega": 0.05},
    )
    means_e = np.asarray(res.means)
    means_u = np.asarray(ukf.means)
    half = T // 2
    d_theta = means_e[:, half:, 0] - means_u[:, half:, 0]
    d_theta = d_theta - 2.0 * np.round(d_theta / 2.0)
    assert np.abs(d_theta).max() < 0.05
    assert np.abs(means_e[:, half:, 1] - means_u[:, half:, 1]).max() < 0.05
    omega_u = float(np.sqrt(np.mean((means_u[:, half:, 1] - obs_true[:, half:, 1]) ** 2)))
    assert omega_u < 0.06, omega_u


def test_batched_matches_per_trajectory(pendulum_case):
    env, obs_noisy, obs_true, actions, res = pendulum_case
    single = estimate.run_ekf(
        env,
        obs_noisy[0],
        np.asarray(actions)[0],
        measured_fields=("theta",),
        process_std={"omega": 0.05},
        smooth=True,
    )
    assert np.allclose(np.asarray(single.means), np.asarray(res.means)[0], atol=1e-9)
    assert np.allclose(np.asarray(single.nll), np.asarray(res.nll)[0], atol=1e-7)
    assert np.asarray(res.nll).shape == (B,)
    assert np.asarray(res.means).shape == (B, T, 2)
    assert np.asarray(res.covs).shape == (B, T, 2, 2)


def test_nll_prefers_the_true_measurement_std(pendulum_case):
    env, obs_noisy, obs_true, actions, _ = pendulum_case

    def nll(sigma):
        r = estimate.run_ekf(
            env,
            obs_noisy,
            actions,
            measured_fields=("theta",),
            process_std={"omega": 0.05},
            measurement_std={"theta": sigma},
        )
        return float(np.sum(np.asarray(r.nll)))

    truth = nll(SIGMA_THETA)
    assert truth < nll(SIGMA_THETA * 20)
    assert truth < nll(SIGMA_THETA / 20)


def test_defaults_come_from_the_envs_own_noise_config(pendulum_case):
    env, obs_noisy, obs_true, actions, _ = pendulum_case
    # measurement_std defaults to env._observation_noise (theta: SIGMA_THETA)
    a = estimate.run_ekf(env, obs_noisy, actions, measured_fields=("theta",),
                         process_std={"omega": 0.05})
    b = estimate.run_ekf(env, obs_noisy, actions, measured_fields=("theta",),
                         process_std={"omega": 0.05},
                         measurement_std={"theta": SIGMA_THETA})
    assert np.allclose(np.asarray(a.means), np.asarray(b.means))


def test_linear_msd_filter_improves_both_fields():
    env = excenvs.MassSpringDamper(
        batch_size=B, tau=TAU,
        observation_noise={"deflection": 0.3, "velocity": 0.3},
    )
    clean = excenvs.MassSpringDamper(batch_size=B, tau=TAU)
    st = env.vmap_reset(KEYS)[1]
    t = jnp.arange(T) * TAU
    actions = jnp.broadcast_to(0.5 * jnp.sin(3.0 * t)[None, :, None], (B, T, 1))
    obs_noisy = np.asarray(env.vmap_rollout(st, actions)[0])
    obs_true = np.asarray(clean.vmap_rollout(st, actions)[0])
    res = estimate.run_ekf(env, obs_noisy, actions)
    means = np.asarray(res.means)
    half = T // 2
    for i in range(2):
        raw = float(np.sqrt(np.mean((obs_noisy[:, half:, i] - obs_true[:, half:, i]) ** 2)))
        filt = float(np.sqrt(np.mean((means[:, half:, i] - obs_true[:, half:, i]) ** 2)))
        assert filt < 0.6 * raw, (i, filt, raw)


def test_float32_inputs_are_promoted(pendulum_case):
    env, obs_noisy, obs_true, actions, res = pendulum_case
    # f32 measurement logs (the TPU-native width) must not crash the f64
    # filter program: inputs are promoted to one consistent float width
    r32 = estimate.run_ekf(
        env,
        obs_noisy[0].astype(np.float32),
        np.asarray(actions)[0].astype(np.float32),
        measured_fields=("theta",),
        process_std={"omega": 0.05},
    )
    d = np.asarray(r32.means) - np.asarray(res.means)[0]
    assert np.abs(d).max() < 1e-5  # only the f32 quantization of the inputs


def test_ekf_on_stochastic_pmsm_drive():
    """Current observer on the drive: the EKF transition goes through the
    PMSM's own hooks (inverter constraint + deadtime buffer swap + derived
    torque), measurements map through the cos/sin-aware column layout, and
    the filtered currents beat the raw noisy sensor."""
    B_, T_ = 2, 200
    sig = {"i_d": 8.0, "i_q": 8.0}
    noisy = excenvs.PMSM(batch_size=B_, saturated=False, observation_noise=sig)
    clean = excenvs.PMSM(batch_size=B_, saturated=False)
    keys = jax.random.split(jax.random.PRNGKey(3), B_)
    st = noisy.vmap_reset(keys)[1]
    st_c = clean.vmap_reset(keys)[1]
    t = jnp.arange(T_) * noisy.tau
    acts = jnp.broadcast_to(
        0.15 * jnp.stack([jnp.sin(300.0 * t), jnp.cos(300.0 * t)], axis=-1)[None],
        (B_, T_, 2),
    )
    obs_noisy, _ = noisy.vmap_rollout(st, acts)
    obs_true, _ = clean.vmap_rollout(st_c, acts)

    res = estimate.run_ekf(
        noisy,
        np.asarray(obs_noisy),
        acts,
        measured_fields=("i_d", "i_q", "omega_el"),
        process_std={"i_d": 1.0, "i_q": 1.0},
    )
    names = tuple(f.name for f in __import__("dataclasses").fields(noisy.PhysicalState))
    half = T_ // 2
    for field, col in (("i_d", 0), ("i_q", 1)):
        k = names.index(field)
        est = np.asarray(res.means)[:, half:, k]
        true = np.asarray(obs_true)[:, half:, col]
        raw = np.asarray(obs_noisy)[:, half:, col]
        rmse_f = float(np.sqrt(np.mean((est - true) ** 2)))
        rmse_raw = float(np.sqrt(np.mean((raw - true) ** 2)))
        assert rmse_f < 0.6 * rmse_raw, (field, rmse_f, rmse_raw)

    # the UKF shares the generalized plumbing (sigma points through the
    # drive's constrained step) and reconstructs at least as well
    res_u = estimate.run_ukf(
        noisy,
        np.asarray(obs_noisy),
        acts,
        measured_fields=("i_d", "i_q", "omega_el"),
        process_std={"i_d": 1.0, "i_q": 1.0},
    )
    for field, col in (("i_d", 0), ("i_q", 1)):
        k = names.index(field)
        est = np.asarray(res_u.means)[:, half:, k]
        true = np.asarray(obs_true)[:, half:, col]
        raw = np.asarray(obs_noisy)[:, half:, col]
        rmse_f = float(np.sqrt(np.mean((est - true) ** 2)))
        rmse_raw = float(np.sqrt(np.mean((raw - true) ** 2)))
        assert rmse_f < 0.6 * rmse_raw, (field, rmse_f, rmse_raw)

    # epsilon is cos/sin-encoded, not a measurable column
    with pytest.raises(ValueError, match="measurable"):
        estimate.run_ekf(
            noisy, np.asarray(obs_noisy), acts, measured_fields=("epsilon",)
        )


def test_validation_errors():
    env = excenvs.Pendulum(batch_size=B, tau=TAU)
    obs = np.zeros((T, 3))
    act = np.zeros((T, 1))
    with pytest.raises(ValueError, match="measured_fields"):
        estimate.run_ekf(env, obs, act, measured_fields=("nope",))
    with pytest.raises(ValueError, match="process_std"):
        estimate.run_ekf(env, obs, act, process_std={"nope": 0.1})
    with pytest.raises(ValueError, match="time shape"):
        estimate.run_ekf(env, obs, act[:-1])
    with pytest.raises(ValueError, match="x0"):
        estimate.run_ekf(env, obs, act, x0=np.zeros(5))
    with pytest.raises(ValueError, match="at least one"):
        estimate.run_ekf(env, obs, act, measured_fields=())


def test_stationary_kalman_gain_linear_exactness_and_fixed_point():
    """The transition matrices are exact for a linear env (the env's own
    step IS the affine map), and the returned (K, P) sit on the Riccati
    fixed point."""
    env = excenvs.InductionMachine(
        batch_size=4,
        process_noise={"i_sd": 0.1, "i_sq": 0.1},
        observation_noise={"i_sd": 0.3, "i_sq": 0.3},
    )
    sk = estimate.stationary_kalman_gain(env, measured_fields=("i_sd", "i_sq"))
    assert sk.names == ("i_sd", "i_sq", "psi_rd", "psi_rq")

    # exactness: the env's own step at a random point equals A x + B u + c
    f = estimate._make_dynamics(env, env.env_properties)
    rng = np.random.default_rng(0)
    x = rng.uniform(-0.5, 0.5, 4)
    u = rng.uniform(-0.8, 0.8, 2)
    np.testing.assert_allclose(
        np.asarray(f(jnp.asarray(x), jnp.asarray(u))),
        sk.A @ x + sk.B @ u + sk.c,
        rtol=0, atol=1e-12,
    )

    # fixed point: one more predicted-form Riccati iteration leaves P as is
    names, n, midx, zidx, Q, R, periods = estimate._resolve_setup(
        env, env.env_properties, ("i_sd", "i_sq"), None, None
    )
    Qn = np.asarray(Q) + 1e-8 * np.eye(n)
    m = np.asarray(midx)
    P = sk.P
    S = P[np.ix_(m, m)] + np.asarray(R)
    K = np.linalg.solve(S.T, P[:, m].T).T
    P_next = sk.A @ (P - K @ P[m, :]) @ sk.A.T + Qn
    np.testing.assert_allclose(P_next, P, rtol=0, atol=1e-11)
    np.testing.assert_allclose(K, sk.K, rtol=0, atol=1e-11)

    # the gain couples measured currents into the unmeasured flux rows
    assert np.abs(sk.K[2:, :]).max() > 0


def test_stationary_kalman_gain_stationary_observer_tracks_flux():
    """A constant-gain observer fed only noisy currents reconstructs the
    rotor flux of a driven machine."""
    B_, T = 64, 3000
    plant = excenvs.InductionMachine(
        batch_size=B_, observation_noise={"i_sd": 0.3, "i_sq": 0.3}
    )
    sk = estimate.stationary_kalman_gain(plant, measured_fields=("i_sd", "i_sq"))
    _, st = plant.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B_))
    # persistent excitation: rotating voltage near the slip frequency band
    t = jnp.arange(T) * plant.tau
    w = 2 * np.pi * 48.0
    acts = 0.55 * jnp.stack([jnp.cos(w * t), jnp.sin(w * t)], axis=-1)
    acts = jnp.broadcast_to(acts[None], (B_, T, 2))
    obs, _ = plant.vmap_rollout(st, acts)

    A, Bm, K, m = jnp.asarray(sk.A), jnp.asarray(sk.B), jnp.asarray(sk.K), sk.midx

    def observe(obs_t, act_t):
        def step(xh, zu):
            z, u = zu
            xc = xh + K @ (z - xh[jnp.asarray(m)])
            return A @ xc + Bm @ u, xc
        _, xcs = jax.lax.scan(step, jnp.zeros((4,)), (obs_t[:, :2], act_t))
        return xcs

    xcs = jax.vmap(observe)(obs, acts)  # normalized corrected beliefs
    # flux spans are [-1.5, 1.5]: denormalize columns 2,3
    psi_hat_d = xcs[:, -1, 2] * 1.5
    psi_hat_q = xcs[:, -1, 3] * 1.5
    # truth from a noise-free twin (same keys/actions; obs noise leaves the
    # state exact, so the final state matches the plant's)
    err_d = np.asarray(psi_hat_d) - np.asarray(_final_flux(plant, st, acts, "psi_rd"))
    err_q = np.asarray(psi_hat_q) - np.asarray(_final_flux(plant, st, acts, "psi_rq"))
    scale = max(1e-9, float(np.abs(np.asarray(_final_flux(plant, st, acts, "psi_rd"))).max()))
    assert np.abs(err_d).max() < 0.05 * scale + 0.01
    assert np.abs(err_q).max() < 0.05 * scale + 0.01


def _final_flux(plant, st, acts, name):
    _, fin = plant.vmap_rollout(st, acts)
    return getattr(fin.physical_state, name)


def test_stationary_kalman_gain_rejects_nonlinear_envs():
    # angle-wrapped fields are rejected up front
    with pytest.raises(ValueError, match="linear"):
        estimate.stationary_kalman_gain(
            excenvs.Pendulum(batch_size=4, observation_noise={"theta": 0.05})
        )
    # a smooth nonlinearity is caught by the linearization probe
    with pytest.raises(ValueError, match="linear"):
        estimate.stationary_kalman_gain(excenvs.VanDerPol(batch_size=4))
