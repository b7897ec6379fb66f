"""On-device MPC (utils/mpc.py): mechanics fast, control quality in slow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.utils import mpc
from exciting_environments_tpu.utils.episodes import reset_with_references


def _env(batch_size=4, tau=2e-2):
    return excenvs.Pendulum(batch_size=batch_size, tau=tau, control_state=["theta"])


def _state(env, seed=0):
    _, state = jax.jit(lambda k: reset_with_references(env, k))(jax.random.PRNGKey(seed))
    return state


def test_mppi_plan_improves_default_cost():
    env = _env()
    state = _state(env)
    cfg = mpc.MPPIConfig(horizon=10, n_samples=64, noise_sigma=0.4, n_iterations=2)
    plan0 = jnp.zeros((4, 10, 1))
    plan1 = mpc.mppi_plan(env, state, plan0, jax.random.PRNGKey(1), cfg)
    assert plan1.shape == plan0.shape
    assert bool((jnp.abs(plan1) <= 1.0).all())
    c0 = mpc._trajectory_cost(env, state, plan0, None)
    c1 = mpc._trajectory_cost(env, state, plan1, None)
    assert float(c1.mean()) < float(c0.mean())


def test_run_mppi_shapes_and_feasibility():
    env = _env()
    state = _state(env)
    cfg = mpc.MPPIConfig(horizon=8, n_samples=32, n_iterations=1)
    res = mpc.run_mppi(env, state, n_steps=6, key=jax.random.PRNGKey(2), config=cfg)
    assert res.observations.shape == (4, 6, len(env.obs_description))
    assert res.actions.shape == (4, 6, env.action_dim)
    assert res.rewards.shape == (4, 6)
    assert res.plan.shape == (4, 8, env.action_dim)
    for leaf in jax.tree_util.tree_leaves(res[:3]):
        assert np.isfinite(np.asarray(leaf)).all()
    assert bool((jnp.abs(res.actions) <= 1.0).all())
    # tracking rewards are negative squared errors
    assert bool((res.rewards <= 0).all())


def test_optimize_actions_descends_and_custom_cost():
    env = _env()
    state = _state(env)
    res = mpc.optimize_actions(env, state, jnp.zeros((4, 10, 1)), iterations=30,
                               learning_rate=0.2)
    assert res.costs.shape == (31,)
    assert float(res.costs[-1]) < float(res.costs[0])
    assert bool((jnp.abs(res.actions) <= 1.0).all())

    # pure action-energy cost: the optimum is the zero plan
    res2 = mpc.optimize_actions(
        env, state, 0.5 * jnp.ones((4, 10, 1)), iterations=200, learning_rate=0.3,
        cost_fn=lambda obs, acts: jnp.sum(acts**2, axis=(1, 2)),
    )
    assert float(jnp.abs(res2.actions).max()) < 0.05


def test_smoothed_noise_keeps_marginal_variance():
    eps = jax.random.normal(jax.random.PRNGKey(0), (4096, 2, 64, 1))
    sm = mpc._smooth_noise(eps, 0.8)
    assert sm.shape == eps.shape
    # exponential smoothing with the sqrt(1-beta^2) innovation scale keeps
    # unit variance in steady state; check the horizon tail
    tail_std = float(jnp.std(sm[:, :, 32:, :]))
    assert 0.9 < tail_std < 1.1
    # and neighboring steps are positively correlated
    corr = float(jnp.mean(sm[:, :, 40, 0] * sm[:, :, 41, 0]))
    assert corr > 0.5


def test_validation_errors():
    env = _env()
    state = _state(env)
    cfg = mpc.MPPIConfig(horizon=10)
    with pytest.raises(ValueError, match="shape"):
        mpc.mppi_plan(env, state, jnp.zeros((4, 7, 1)), jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="horizon"):
        mpc.optimize_actions(env, state, jnp.zeros((3, 10, 1)), iterations=1)
    env_no_cs = excenvs.Pendulum(batch_size=4)
    with pytest.raises(ValueError, match="control_state"):
        mpc.mppi_plan(env_no_cs, state, jnp.zeros((4, 10, 1)), jax.random.PRNGKey(0), cfg)
    # a bare vmap_reset leaves references NaN: planning with the default
    # cost must reject it instead of returning NaN plans
    _, bare = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), 4))
    with pytest.raises(ValueError, match="reference"):
        mpc.run_mppi(env, bare, 2, config=cfg)
    # ... unless a custom cost_fn ignores the references
    res = mpc.run_mppi(env, bare, 2, config=mpc.MPPIConfig(horizon=4, n_samples=8),
                       cost_fn=lambda obs, acts: jnp.sum(acts**2, axis=(1, 2)))
    assert np.isfinite(np.asarray(res.actions)).all()


def _rest_tracking_state(env):
    """Pendulum at rest with moderate (statically feasible) reference angles
    — random references can land near the inverted position and random
    initial omega (uniform +-10 rad/s) exceeds what max torque (~5 rad/s^2)
    can arrest inside a short horizon, which would test swing-up, not MPC."""
    from exciting_environments_tpu.core import structures

    B = env.batch_size
    state = _state(env, seed=3)
    with structures.copy_and_mutate(state, validate=False) as state:
        state.physical_state.theta = jnp.zeros(B)
        state.physical_state.omega = jnp.zeros(B)
        state.reference.theta = jnp.linspace(-1.0, 1.0, B)
    return state


@pytest.mark.slow
def test_mppi_closed_loop_tracks_pendulum():
    """Receding-horizon MPPI must track the pendulum angle reference far
    better than the zero policy (fixed seeds, deterministic CPU)."""
    env = _env(batch_size=8)
    state = _rest_tracking_state(env)
    cfg = mpc.MPPIConfig(horizon=30, n_samples=256, temperature=0.02,
                         noise_sigma=0.5, n_iterations=2, smoothing=0.5)
    res = mpc.run_mppi(env, state, n_steps=80, key=jax.random.PRNGKey(4), config=cfg)

    obs, rew, _ = mpc._rollout(env, state, jnp.zeros((8, 80, 1)))
    zero_mean = float(jnp.mean(rew))
    mppi_mean = float(jnp.mean(res.rewards))
    assert mppi_mean > zero_mean + 0.2, (zero_mean, mppi_mean)
    # the second half of the run should be near the reference
    assert float(jnp.mean(res.rewards[:, 40:])) > -0.15


@pytest.mark.slow
def test_gradient_planner_matches_mppi():
    """On the smooth pendulum tracking problem the gradient planner should
    reach (within a small tolerance) the cost iterated MPPI reaches from the
    same zero warm start."""
    env = _env(batch_size=8)
    state = _rest_tracking_state(env)
    plan0 = jnp.zeros((8, 30, 1))
    cfg = mpc.MPPIConfig(horizon=30, n_samples=256, temperature=0.02,
                         noise_sigma=0.5, n_iterations=8, smoothing=0.5)
    plan_mppi = mpc.mppi_plan(env, state, plan0, jax.random.PRNGKey(2), cfg)
    c_mppi = float(mpc._trajectory_cost(env, state, plan_mppi, None).mean())
    res = mpc.optimize_actions(env, state, plan0, iterations=400, learning_rate=0.1)
    assert float(res.costs[-1]) <= c_mppi + 0.05, (float(res.costs[-1]), c_mppi)


def test_planning_path_and_strict_fused():
    env = _env(batch_size=8)
    state = _state(env)
    cfg = mpc.MPPIConfig(horizon=4, n_samples=128)  # 128 * 8 = one kernel tile
    # CPU backend without interpret mode: the compiled kernels don't exist
    assert mpc.planning_path(env, cfg) == "scan"
    assert mpc.planning_path(env, cfg, interpret=True) == "fused"
    # out of kernel scope regardless: batch not tileable
    assert mpc.planning_path(env, mpc.MPPIConfig(horizon=4, n_samples=100),
                             interpret=True) == "scan"
    with pytest.raises(ValueError, match="fused=True"):
        mpc.mppi_plan(env, state, jnp.zeros((8, 4, 1)), jax.random.PRNGKey(0),
                      cfg, fused=True)


@pytest.mark.slow
def test_fused_planning_matches_scan():
    """The fused backend folds the sample axis into the kernel batch; same
    candidate draws -> the plan must match the scan backend (CPU interpret
    closeness per the kernel-vs-scan ground rules)."""
    env = _env(batch_size=8)
    state = _state(env)
    cfg = mpc.MPPIConfig(horizon=4, n_samples=128, noise_sigma=0.4, n_iterations=2)
    plan0 = jnp.zeros((8, 4, 1))
    p_scan = mpc.mppi_plan(env, state, plan0, jax.random.PRNGKey(1), cfg, fused=False)
    p_fused = mpc.mppi_plan(env, state, plan0, jax.random.PRNGKey(1), cfg,
                            fused=True, interpret=True)
    np.testing.assert_allclose(np.asarray(p_fused), np.asarray(p_scan),
                               rtol=1e-11, atol=1e-12)

    res_f = mpc.run_mppi(env, state, 3, key=jax.random.PRNGKey(2), config=cfg,
                         fused=True, interpret=True)
    res_s = mpc.run_mppi(env, state, 3, key=jax.random.PRNGKey(2), config=cfg,
                         fused=False)
    np.testing.assert_allclose(np.asarray(res_f.observations),
                               np.asarray(res_s.observations),
                               rtol=1e-11, atol=1e-12)


@pytest.mark.slow
def test_fused_planning_pmsm_matches_scan():
    """PMSM candidate rollouts ride the drive kernel (deadtime + hexagon
    constraint inside); plans must match the vmap_step scan backend."""
    env = excenvs.PMSM(batch_size=8, control_state=["i_d", "i_q"])
    from exciting_environments_tpu.utils.episodes import reset_with_references
    _, state = jax.jit(lambda k: reset_with_references(env, k))(jax.random.PRNGKey(0))
    cfg = mpc.MPPIConfig(horizon=2, n_samples=128, noise_sigma=0.3, n_iterations=1)
    assert mpc.planning_path(env, cfg, interpret=True) == "pmsm_fused"
    plan0 = jnp.zeros((8, 2, 2))
    p_scan = mpc.mppi_plan(env, state, plan0, jax.random.PRNGKey(1), cfg, fused=False)
    p_fused = mpc.mppi_plan(env, state, plan0, jax.random.PRNGKey(1), cfg,
                            fused=True, interpret=True)
    np.testing.assert_allclose(np.asarray(p_fused), np.asarray(p_scan),
                               rtol=1e-11, atol=1e-12)


@pytest.mark.slow
def test_mppi_pmsm_current_control():
    """Receding-horizon MPPI on the saturated BRUSA drive must track random
    dq current references to near-zero cost (fixed seeds; the exact step
    semantics include deadtime + hexagon constraint)."""
    env = excenvs.PMSM(batch_size=8, saturated=True,
                       motor_variant=excenvs.MotorVariant.BRUSA,
                       control_state=["i_d", "i_q"], tau=1e-4)
    _, state = jax.jit(lambda k: reset_with_references(env, k))(jax.random.PRNGKey(7))
    cfg = mpc.MPPIConfig(horizon=8, n_samples=32, temperature=0.02,
                         noise_sigma=0.3, n_iterations=1, smoothing=0.3)
    res = mpc.run_mppi(env, state, n_steps=40, key=jax.random.PRNGKey(8), config=cfg)

    _, rew_zero, _ = mpc._rollout(env, state, jnp.zeros((8, 40, 2)))
    zero_mean = float(jnp.mean(rew_zero))
    settled = float(jnp.mean(res.rewards[:, 20:]))
    assert settled > -0.05, (zero_mean, settled)
    assert float(jnp.mean(res.rewards)) > zero_mean + 1.0
