"""Solver-stack verification: order of convergence, FSAL carry semantics,
agreement with closed-form solutions (replaces the diffrax cross-checks the
reference delegated to its dependency)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exciting_environments_tpu.ops.rollout import solve_trajectory, step_loop, zoh_action
from exciting_environments_tpu.ops.solvers import (
    RK4,
    Dopri5,
    Euler,
    Heun,
    ImplicitEuler,
    Midpoint,
    Tsit5,
    make_solver,
)


def _decay(t, y, args):
    # dy/dt = -lambda * y, exact solution y0 * exp(-lambda t)
    (lam,) = args
    return (-lam * y[0],)


def _oscillator(t, y, args):
    x, v = y
    return (v, -x)


def _global_error(solver, n_steps):
    y0 = (1.0,)
    lam = 2.0
    h = 1.0 / n_steps
    ys, y_last = solve_trajectory(solver, _decay, y0, (lam,), n_steps, h)
    exact = np.exp(-lam * 1.0)
    return abs(float(y_last[0]) - exact)


@pytest.mark.parametrize(
    "solver,expected_order",
    [
        (Euler(), 1),
        (Midpoint(), 2),
        (Heun(), 2),
        (RK4(), 4),
        (Tsit5(), 5),
        (Dopri5(), 5),
    ],
    ids=lambda v: v if isinstance(v, int) else type(v).__name__,
)
def test_order_of_convergence(solver, expected_order):
    """Halving the step size must reduce the global error ~2^order."""
    e1 = _global_error(solver, 64)
    e2 = _global_error(solver, 128)
    measured = np.log2(e1 / e2)
    assert measured > expected_order - 0.5, f"measured order {measured:.2f} < {expected_order}"


def test_euler_arithmetic_exact():
    """Euler must compute exactly y + h*f(t, y) with no extra rounding."""
    solver = Euler()
    y0 = (0.3,)
    h = 1e-4
    f = _decay
    y1, _ = solver.step(f, 0.0, h, y0, (2.0,), solver.init(f, 0.0, h, y0, (2.0,)))
    expected = 0.3 + h * (-2.0 * 0.3)
    assert float(y1[0]) == expected


def test_fsal_carry_structure():
    """FSAL solvers carry f(t1, y1); non-FSAL solvers carry nothing."""
    f = _oscillator
    y0 = (1.0, 0.0)
    for solver in (Tsit5(), Dopri5()):
        carry = solver.init(f, 0.0, 0.1, y0, ())
        assert jax.tree_util.tree_structure(carry) == jax.tree_util.tree_structure(y0)
        y1, carry1 = solver.step(f, 0.0, 0.1, y0, (), carry)
        expected = f(0.1, y1, ())
        assert np.allclose(jax.tree_util.tree_leaves(carry1), jax.tree_util.tree_leaves(expected))
    for solver in (Euler(), RK4()):
        assert solver.init(f, 0.0, 0.1, y0, ()) is None


def test_oscillator_energy_tsit5():
    """Tsit5 on the harmonic oscillator keeps energy to high accuracy."""
    ys, y_last = solve_trajectory(Tsit5(), _oscillator, (1.0, 0.0), (), 1000, 0.01)
    e = float(y_last[0]) ** 2 + float(y_last[1]) ** 2
    assert abs(e - 1.0) < 1e-8
    assert abs(float(y_last[0]) - np.cos(10.0)) < 1e-8


def test_implicit_euler_stiff_stability():
    """Backward Euler stays stable on a stiff decay where explicit Euler blows up."""
    lam = 1e4
    h = 1e-3  # explicit Euler unstable: |1 - lam*h| = 9 > 1
    imp = ImplicitEuler()
    _, y_last = solve_trajectory(imp, _decay, (1.0,), (lam,), 50, h)
    assert abs(float(y_last[0])) < 1.0
    _, y_exp = solve_trajectory(Euler(), _decay, (1.0,), (lam,), 50, h)
    assert abs(float(y_exp[0])) > 1.0


def test_zoh_action_indexing():
    actions = jnp.arange(10.0).reshape(5, 2)
    act = zoh_action(actions, 0.1)
    assert jnp.array_equal(act(0.0), actions[0])
    assert jnp.array_equal(act(0.25), actions[2])
    # out-of-range times clamp to the final action (jnp gather semantics)
    assert jnp.array_equal(act(0.5), actions[4])


def test_step_loop_matches_trajectory_euler():
    """For Euler with matching step sizes, the re-anchored step loop and the
    trajectory solve agree bit-exactly when the step is a power of two (for
    non-dyadic steps the trajectory's ``(t+h)-t`` differs by <= 1 ulp, same
    as the reference's accumulated diffrax stepping)."""
    f = _oscillator
    h = 1.0 / 128.0  # dyadic: k*h and (t+h)-t are exact in binary floating point
    ys_t, y_t = solve_trajectory(Euler(), f, (1.0, 0.0), (), 128, h)
    ys_l, y_l = step_loop(Euler(), f, (1.0, 0.0), (), 128, h)
    assert np.array_equal(np.asarray(y_t), np.asarray(y_l))
    # non-dyadic steps still agree to floating-point accuracy
    _, y_t2 = solve_trajectory(Euler(), f, (1.0, 0.0), (), 100, 0.01)
    _, y_l2 = step_loop(Euler(), f, (1.0, 0.0), (), 100, 0.01)
    assert np.allclose(np.asarray(y_t2), np.asarray(y_l2), rtol=1e-12)


def test_make_solver_registry():
    assert isinstance(make_solver("tsit5"), Tsit5)

    # reference-style construction: any foreign object whose class name
    # matches a registry entry (diffrax.Tsit5() in reference code)
    class Tsit5Foreign:
        pass

    Tsit5Foreign.__name__ = "Tsit5"
    assert isinstance(make_solver(Tsit5Foreign()), Tsit5)

    class ImplicitEuler:  # diffrax spells it without the underscore
        pass

    from exciting_environments_tpu.ops.solvers import ImplicitEuler as Ours

    assert isinstance(make_solver(ImplicitEuler()), Ours)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="known names"):
        make_solver("no_such_solver")
    s = Euler()
    assert make_solver(s) is s


def test_implicit_euler_inside_environment():
    """The implicit solver plugs into the full environment step protocol."""
    import exciting_environments_tpu as excenvs

    env = excenvs.MassSpringDamper(batch_size=4, solver="implicit_euler", tau=1e-2)
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), 4))
    for _ in range(20):
        obs, state = env.vmap_step(state, 0.3 * jnp.ones((4, 1)))
    assert bool(jnp.isfinite(obs).all())
    # backward Euler is dissipative: stiff spring stays bounded at a step
    # size where explicit Euler oscillates hard (k=100, tau=1e-2 -> |1-k*tau^2|...)
    assert float(jnp.max(jnp.abs(state.physical_state.deflection))) < 10.0

    # accuracy sanity: small tau implicit ~ explicit
    env_e = excenvs.MassSpringDamper(batch_size=4, tau=1e-4)
    env_i = excenvs.MassSpringDamper(batch_size=4, solver="implicit_euler", tau=1e-4)
    _, se = env_e.vmap_reset(jax.random.split(jax.random.PRNGKey(1), 4))
    _, si = env_i.vmap_reset(jax.random.split(jax.random.PRNGKey(1), 4))
    for _ in range(50):
        _, se = env_e.vmap_step(se, 0.2 * jnp.ones((4, 1)))
        _, si = env_i.vmap_step(si, 0.2 * jnp.ones((4, 1)))
    np.testing.assert_allclose(
        np.asarray(si.physical_state.deflection),
        np.asarray(se.physical_state.deflection),
        atol=1e-3,
    )


def test_fsal_step_mode_evaluates_current_action():
    """Step-mode re-initializes the FSAL carry per step, so each step's first
    stage sees the CURRENT action — equal to manual fresh-init integration.
    (Reusing the previous step's carry would evaluate k1 under the previous
    action: silently wrong dynamics under varying actions.)"""
    import exciting_environments_tpu as excenvs
    from exciting_environments_tpu.ops.solvers import Tsit5

    B, N = 4, 30
    env = excenvs.Pendulum(batch_size=B, solver="tsit5", tau=1e-2)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    _, state = env.vmap_reset(keys)

    # alternating full-scale actions: stale-carry reuse diverges immediately
    actions = [((-1.0) ** i) * jnp.ones((B, 1)) for i in range(N)]
    st = state
    for a in actions:
        _, st = env.vmap_step(st, a)

    # ground truth: manual per-step fresh-init Tsit5 on the physical system
    solver = Tsit5()
    params = env.env_properties.static_params
    theta = np.asarray(state.physical_state.theta).copy()
    omega = np.asarray(state.physical_state.omega).copy()
    y = (jnp.asarray(theta), jnp.asarray(omega))
    norm = env.env_properties.action_normalizations.torque
    for a in actions:
        u = a[:, 0] * (norm.max - norm.min) / 2 + (norm.max + norm.min) / 2

        def f(t, yy, args):
            th, om = yy
            return (om, (u + args.l * args.m * args.g * jnp.sin(th)) / (args.m * args.l**2))

        carry = solver.init(f, 0.0, env.tau, y, params)
        y, _ = solver.step(f, 0.0, env.tau, y, params, carry)
        y = (((y[0] + jnp.pi) % (2 * jnp.pi)) - jnp.pi, y[1])

    np.testing.assert_allclose(
        np.asarray(st.physical_state.theta), np.asarray(y[0]), rtol=1e-12, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(st.physical_state.omega), np.asarray(y[1]), rtol=1e-12, atol=1e-12
    )
