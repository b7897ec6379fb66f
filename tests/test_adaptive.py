"""Batched adaptive integration: accuracy, efficiency, per-instance control."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.ops.adaptive import adaptive_rollout, adaptive_solve
from exciting_environments_tpu.ops.rollout import solve_trajectory
from exciting_environments_tpu.ops.solvers import Dopri5, Euler, Tsit5


def _decay(t, y, args):
    (lam,) = args
    return (-lam * y[0],)


def _oscillator(t, y, args):
    x, v = y
    return (v, -x)


@pytest.mark.parametrize("solver", [Tsit5(), Dopri5()], ids=["tsit5", "dopri5"])
def test_accuracy_tracks_tolerance(solver):
    for rtol in [1e-4, 1e-8]:
        y, stats = adaptive_solve(solver, _decay, (1.0,), (2.0,), 0.0, 1.0, rtol=rtol, atol=rtol)
        err = abs(float(y[0]) - np.exp(-2.0))
        assert err < 50 * rtol, f"rtol={rtol}: err {err}"


def test_fewer_steps_than_fixed_for_same_accuracy():
    """Adaptive Tsit5 reaches fixed-step accuracy with far fewer steps on a
    smooth problem."""
    y_fix, _ = solve_trajectory(Tsit5(), _oscillator, (1.0, 0.0), (), 1000, 0.01)
    y_ad, stats = adaptive_solve(Tsit5(), _oscillator, (1.0, 0.0), (), 0.0, 10.0, rtol=1e-8, atol=1e-10)
    assert abs(float(y_ad[0]) - np.cos(10.0)) < 1e-6
    assert int(stats.accepted) < 300  # vs 1000 fixed steps


def test_per_instance_step_counts():
    """A batch mixing slow and fast dynamics takes per-instance step counts."""
    lams = jnp.array([0.1, 1.0, 10.0, 100.0])
    y0 = (jnp.ones(4),)
    y, stats = adaptive_solve(Tsit5(), _decay, y0, (lams,), 0.0, 1.0, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(y[0]), np.exp(-np.asarray(lams)), rtol=1e-5, atol=1e-8)
    counts = np.asarray(stats.accepted)
    assert counts[3] > 3 * counts[0], f"stiffest instance should take more steps: {counts}"


def test_rejections_happen_and_converge():
    """A deliberately huge initial step gets rejected, then the controller
    recovers."""
    y, stats = adaptive_solve(Tsit5(), _decay, (1.0,), (50.0,), 0.0, 1.0, dt0=1.0, rtol=1e-6, atol=1e-9)
    assert int(stats.rejected) >= 1
    assert abs(float(y[0]) - np.exp(-50.0)) < 1e-6


def test_no_embedded_pair_rejected():
    with pytest.raises(ValueError, match="embedded"):
        adaptive_solve(Euler(), _decay, (1.0,), (1.0,), 0.0, 1.0)


def test_overflowing_trial_step_recovers():
    """A trial step that overflows to non-finite must be rejected (shrinking
    dt by min_factor), not poison the controller."""
    y, stats = adaptive_solve(
        Tsit5(), lambda t, y, a: (-(y[0] ** 3) * 1e6,), (1.0,), (), 0.0, 1.0, dt0=1.0
    )
    assert np.isfinite(float(y[0])) and np.isfinite(float(stats.final_dt))
    assert int(stats.accepted) > 0
    # y' = -1e6 y^3, y(0)=1 -> y(1) = 1/sqrt(1 + 2e6) ~ 7.07e-4
    np.testing.assert_allclose(float(y[0]), (1 + 2e6) ** -0.5, rtol=1e-3)


def test_mixed_scalar_and_batched_leaves():
    """Docstring contract: y0 leaves may mix scalars and (B,) arrays."""
    def f(t, y, args):
        x, v = y
        return (v, -x)

    y, stats = adaptive_solve(Tsit5(), f, (1.0, jnp.zeros(4)), (), 0.0, 3.0, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(y[0]), np.full(4, np.cos(3.0)), rtol=1e-5)


def test_fsal_reuse_matches_plain_stepping():
    """The FSAL first-stage carry must not change results beyond rounding."""
    from exciting_environments_tpu.ops.adaptive import AdaptiveStats  # noqa: F401

    y, stats = adaptive_solve(Tsit5(), _oscillator, (1.0, 0.0), (), 0.0, 10.0, rtol=1e-8, atol=1e-10)
    # vs a non-FSAL embedded solver on the same problem
    y2, _ = adaptive_solve(Dopri5(), _oscillator, (1.0, 0.0), (), 0.0, 10.0, rtol=1e-8, atol=1e-10)
    assert abs(float(y[0]) - np.cos(10.0)) < 1e-6
    assert abs(float(y2[0]) - np.cos(10.0)) < 1e-6


def test_adaptive_rollout_matches_fine_fixed_step():
    """Env-level adaptive rollout agrees with a 50x-oversampled fixed-step
    rollout on the pendulum (same ZOH action sequence)."""
    B, N = 16, 20
    env = excenvs.Pendulum(batch_size=B, tau=2e-2)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    _, state = env.vmap_reset(keys)
    actions = jax.random.uniform(jax.random.PRNGKey(1), (B, N, 1), minval=-0.8, maxval=0.8)

    obs, last, stats = adaptive_rollout(env, state, actions, rtol=1e-8, atol=1e-10)

    sub = 50
    env_f = excenvs.Pendulum(batch_size=B, tau=env.tau / sub, solver="rk4")
    _, state_f = env_f.vmap_reset(keys)
    actions_f = jnp.repeat(actions, sub, axis=1)
    _, last_f = env_f.vmap_rollout(state_f, actions_f, N * sub)

    np.testing.assert_allclose(
        np.asarray(last.physical_state.theta), np.asarray(last_f.physical_state.theta), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(last.physical_state.omega), np.asarray(last_f.physical_state.omega), atol=1e-5
    )
    assert obs.shape == (B, 2)
    assert int(jnp.min(stats.accepted)) > 0


def test_adaptive_rollout_resolves_stiff_heterogeneous_batch():
    """Per-batch stiffness (MSD spring constants spanning 1..1e6) is resolved
    per instance: the fixed-step path diverges for the stiff entries at this
    tau while the adaptive path stays accurate, taking more steps there."""
    ks = jnp.array([1.0, 100.0, 1e4, 1e6])
    B = 4
    env = excenvs.MassSpringDamper(
        batch_size=B, tau=2e-2, static_params={"k": ks, "d": 0.0, "m": 1.0}
    )
    _, state = env.vmap_reset()
    from exciting_environments_tpu.core import structures

    state = structures.replace(
        state,
        physical_state=env.PhysicalState(
            deflection=jnp.ones(B), velocity=jnp.zeros(B)
        ),
    )
    actions = jnp.zeros((B, 5, 1))  # free oscillation: x(t) = cos(sqrt(k) t)

    obs, last, stats = adaptive_rollout(env, state, actions, rtol=1e-9, atol=1e-11,
                                        max_steps_per_interval=10_000)
    t_end = 5 * env.tau
    expected = np.cos(np.sqrt(np.asarray(ks)) * t_end)
    np.testing.assert_allclose(np.asarray(last.physical_state.deflection), expected, atol=1e-4)

    counts = np.asarray(stats.accepted)
    assert counts[3] > 10 * counts[0], f"stiff instance must take more steps: {counts}"

    # the fixed-step path at this tau is unstable for the stiff entries
    _, last_fixed = env.vmap_rollout(state, actions, 5)
    assert not np.all(np.isfinite(np.asarray(last_fixed.physical_state.deflection))) or (
        np.max(np.abs(np.asarray(last_fixed.physical_state.deflection))) > 10
    )


def test_adaptive_rollout_applies_clip():
    """FluidTank's h >= 0 clip applies at interval boundaries."""
    env = excenvs.FluidTank(batch_size=4, tau=5.0)  # long drain intervals
    _, state = env.vmap_reset()
    actions = -jnp.ones((4, 3, 1))  # zero inflow
    obs, last, stats = adaptive_rollout(env, state, actions)
    h = np.asarray(last.physical_state.height)
    assert np.all(h >= 0.0) and np.all(np.isfinite(h))


def test_incomplete_flag_on_step_budget_exhaustion():
    """Hitting max_steps flags the instance instead of silently returning a
    partially integrated state."""
    y, stats = adaptive_solve(
        Tsit5(), _oscillator, (1.0, 0.0), (), 0.0, 100.0, rtol=1e-10, atol=1e-12, max_steps=5
    )
    assert bool(stats.incomplete)
    y2, stats2 = adaptive_solve(Tsit5(), _decay, (1.0,), (1.0,), 0.0, 1.0)
    assert not bool(stats2.incomplete)


def test_adaptive_rollout_rejects_derived_state_envs_without_hook():
    """A derived-field env without its own _adaptive_rollout still gets the
    explicit guard instead of silently mis-integrating."""

    class PendulumWithDerived(excenvs.Pendulum):
        _ode_state_fields = ("theta",)  # pretend omega is a derived field

    env = PendulumWithDerived(batch_size=4)
    _, state = env.vmap_reset()
    with pytest.raises(ValueError, match="derived fields"):
        adaptive_rollout(env, state, jnp.zeros((4, 3, 1)))


@pytest.mark.slow
def test_pmsm_adaptive_matches_fixed_tsit5_nonstiff():
    """At a benign operating point one Tsit5 step per tau is already accurate,
    so the adaptive path (which reproduces step()'s hexagon/deadtime/torque
    semantics) must agree closely with the fixed-step Tsit5 rollout."""
    B, N = 8, 12
    env = excenvs.PMSM(batch_size=B, tau=1e-4, solver="tsit5")
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    _, state = env.vmap_reset(keys)
    actions = 0.25 * jnp.ones((B, N, 2))

    obs_a, last_a, stats = adaptive_rollout(env, state, actions, rtol=1e-10, atol=1e-12)
    obs_f, last_f = env.vmap_rollout(state, actions, N)

    assert not bool(jnp.any(stats.incomplete))
    np.testing.assert_allclose(
        np.asarray(last_a.physical_state.i_d), np.asarray(last_f.physical_state.i_d),
        rtol=1e-6, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(last_a.physical_state.i_q), np.asarray(last_f.physical_state.i_q),
        rtol=1e-6, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(last_a.physical_state.epsilon), np.asarray(last_f.physical_state.epsilon),
        rtol=1e-6, atol=1e-6,
    )
    # buffer bookkeeping (deadtime swap) is discrete; the constrained voltage
    # itself may differ by rounding between the two vmap contexts
    np.testing.assert_allclose(
        np.asarray(last_a.physical_state.u_d_buffer),
        np.asarray(last_f.physical_state.u_d_buffer), rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(last_a.physical_state.u_q_buffer),
        np.asarray(last_f.physical_state.u_q_buffer), rtol=1e-12,
    )
    assert obs_a.shape == obs_f[:, -1].shape


@pytest.mark.slow
def test_pmsm_adaptive_saturated_lut():
    """Saturated-LUT magnetics integrate adaptively; the final torque is the
    consistent LUT torque of the final currents."""
    B = 6
    env = excenvs.PMSM(batch_size=B, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA)
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    _, state = env.vmap_reset(keys)
    actions = 0.3 * jnp.ones((B, 5, 2))

    obs, last, stats = adaptive_rollout(env, state, actions, rtol=1e-8, atol=1e-10)
    assert bool(jnp.isfinite(obs).all())
    assert not bool(jnp.any(stats.incomplete))
    expected_torque = env.currents_to_torque_saturated(
        last.physical_state.i_d, last.physical_state.i_q, env.env_properties
    )
    np.testing.assert_allclose(
        np.asarray(last.physical_state.torque), np.asarray(expected_torque), rtol=1e-12
    )


def test_pmsm_adaptive_per_batch_params():
    """Per-batch r_s: heterogeneous electrical parameters integrate per
    instance (the sharded wrapper rides these same leaves over the mesh)."""
    B = 8
    r_s = jnp.linspace(5e-3, 50e-3, B)
    params = {"p": 3, "r_s": r_s, "l_d": 0.37e-3, "l_q": 1.2e-3,
              "psi_p": 65.6e-3, "u_dc": 400, "deadtime": 1}
    env = excenvs.PMSM(batch_size=B, tau=1e-4, static_params=params)
    _, state = env.vmap_reset()
    actions = 0.3 * jnp.ones((B, 6, 2))

    obs, last, stats = adaptive_rollout(env, state, actions, rtol=1e-9, atol=1e-11)
    assert bool(jnp.isfinite(obs).all())
    assert not bool(jnp.any(stats.incomplete))
    # identical initial states + actions, different r_s -> different currents
    assert float(jnp.std(last.physical_state.i_d)) > 1e-6


def test_warm_start_survives_interval_clipping():
    """The proposal carried across ZOH intervals must not collapse to each
    interval's tiny remainder step: interval step counts stay flat instead of
    regrowing from near zero every interval."""
    env = excenvs.Pendulum(batch_size=2, tau=2e-2)
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), 2))
    actions = 0.3 * jnp.ones((2, 40, 1))
    _, _, stats = adaptive_rollout(env, state, actions, rtol=1e-6, atol=1e-8)
    # smooth non-stiff dynamics at loose tolerance: a healthy warm start needs
    # only a handful of steps per interval on average
    assert float(jnp.max(stats.accepted)) / 40 < 6, np.asarray(stats.accepted)
    assert not bool(jnp.any(stats.incomplete))
