"""Fused Pallas rollout kernel tests (interpreter mode on CPU).

The kernel must be numerically identical to the XLA scan path
(``vmap_rollout``) for in-scope environments/solvers, and the env-level
wrapper must transparently fall back otherwise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.ops.pallas.stepper import (
    TILE,
    env_fused_rollout,
    env_fused_sim_ahead,
    fused_rollout,
    supports_fused_rollout,
)
from exciting_environments_tpu.ops.solvers import RK4, Euler, Tsit5

BATCH = TILE  # one tile: 1024 environments
T = 16


def _rollout_pair(env_cls, solver, **kwargs):
    env = env_cls(batch_size=BATCH, solver=solver, **kwargs)
    key = jax.random.PRNGKey(0)
    _, state = env.vmap_reset(jax.random.split(key, BATCH))
    actions = jax.random.uniform(
        jax.random.PRNGKey(1), (BATCH, T, env.action_dim), minval=-0.9, maxval=0.9
    )
    obs_ref, last_ref = env.vmap_rollout(state, actions, T)
    obs_fused, last_fused = env_fused_rollout(env, state, actions, interpret=True)
    return env, obs_ref[:, -1], last_ref, obs_fused, last_fused


@pytest.mark.parametrize("env_cls", [excenvs.Pendulum, excenvs.MassSpringDamper, excenvs.CartPole])
def test_fused_matches_scan_euler(env_cls):
    env, obs_ref, last_ref, obs_fused, last_fused = _rollout_pair(env_cls, Euler())
    assert supports_fused_rollout(env)
    np.testing.assert_allclose(np.asarray(obs_fused), np.asarray(obs_ref), rtol=1e-12, atol=1e-12)
    for name in env._ode_state_fields:
        np.testing.assert_allclose(
            np.asarray(getattr(last_fused.physical_state, name)),
            np.asarray(getattr(last_ref.physical_state, name)),
            rtol=1e-12,
            atol=1e-12,
        )


def test_fused_matches_scan_rk4():
    env, obs_ref, last_ref, obs_fused, last_fused = _rollout_pair(excenvs.Pendulum, RK4())
    np.testing.assert_allclose(np.asarray(obs_fused), np.asarray(obs_ref), rtol=1e-10, atol=1e-10)


def test_fused_clip_fluid_tank():
    """The fluid tank's post-step clip must be applied inside the kernel."""
    env = excenvs.FluidTank(batch_size=BATCH)
    _, state = env.vmap_reset()
    # full drain: zero inflow keeps clipping the height at 0
    actions = -jnp.ones((BATCH, T, 1))
    obs_ref, last_ref = env.vmap_rollout(state, actions, T)
    obs_fused, last_fused = env_fused_rollout(env, state, actions, interpret=True)
    np.testing.assert_allclose(np.asarray(obs_fused), np.asarray(obs_ref[:, -1]), rtol=1e-12)
    assert float(jnp.min(last_fused.physical_state.height)) >= 0.0


@pytest.mark.slow
@pytest.mark.parametrize("env_cls", [excenvs.Pendulum, excenvs.CartPole])
def test_fused_tsit5_step_mode(env_cls):
    """FSAL solvers run in the kernel: the carry-only last stage is skipped
    (step mode re-inits it anyway) and the final solver carry is
    reconstructed — matching vmap_rollout incl. the Additions pytree."""
    env, obs_ref, last_ref, obs_fused, last_fused = _rollout_pair(env_cls, Tsit5())
    assert supports_fused_rollout(env)
    np.testing.assert_allclose(np.asarray(obs_fused), np.asarray(obs_ref), rtol=1e-11, atol=1e-11)
    for name in env._ode_state_fields:
        np.testing.assert_allclose(
            np.asarray(getattr(last_fused.physical_state, name)),
            np.asarray(getattr(last_ref.physical_state, name)),
            rtol=1e-11,
            atol=1e-11,
        )
    # FSAL carry: f(t1, y1) under the final action
    for k_f, k_r in zip(last_fused.additions.solver_state, last_ref.additions.solver_state):
        np.testing.assert_allclose(np.asarray(k_f), np.asarray(k_r), rtol=1e-9, atol=1e-9)


def test_fused_per_batch_params():
    """(batch,)-shaped heterogeneous parameter leaves stream as tile operands."""
    lengths = 1.0 + jnp.arange(BATCH) / BATCH
    env = excenvs.Pendulum(
        batch_size=BATCH, static_params={"l": lengths, "g": 9.81, "m": 1}
    )
    assert supports_fused_rollout(env)
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(5), BATCH))
    actions = jax.random.uniform(jax.random.PRNGKey(6), (BATCH, T, 1), minval=-0.9, maxval=0.9)
    obs_ref, last_ref = env.vmap_rollout(state, actions, T)
    obs_fused, last_fused = env_fused_rollout(env, state, actions, interpret=True)
    np.testing.assert_allclose(np.asarray(obs_fused), np.asarray(obs_ref[:, -1]), rtol=1e-11, atol=1e-11)
    for name in env._ode_state_fields:
        np.testing.assert_allclose(
            np.asarray(getattr(last_fused.physical_state, name)),
            np.asarray(getattr(last_ref.physical_state, name)),
            rtol=1e-11,
            atol=1e-11,
        )


def test_fused_per_batch_action_normalization():
    """Per-batch action normalizations ride the vmapped denorm pre-pass."""
    from exciting_environments_tpu.utils import MinMaxNormalization

    env = excenvs.Pendulum(
        batch_size=BATCH,
        action_normalizations={
            "torque": MinMaxNormalization(min=-(10.0 + 10 * jnp.arange(BATCH) / BATCH), max=20.0)
        },
    )
    assert supports_fused_rollout(env)
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(7), BATCH))
    actions = jax.random.uniform(jax.random.PRNGKey(8), (BATCH, T, 1), minval=-0.9, maxval=0.9)
    obs_ref, last_ref = env.vmap_rollout(state, actions, T)
    obs_fused, last_fused = env_fused_rollout(env, state, actions, interpret=True)
    np.testing.assert_allclose(np.asarray(obs_fused), np.asarray(obs_ref[:, -1]), rtol=1e-11, atol=1e-11)


@pytest.mark.parametrize("env_cls,solver", [
    (excenvs.CartPole, "tsit5"),
    (excenvs.Acrobot, "tsit5"),
    (excenvs.Pendulum, "rk4"),
    (excenvs.Pendulum, "euler"),
])
@pytest.mark.slow
def test_fused_sim_ahead_matches_scan(env_cls, solver):
    """Fused sim-ahead == vmap_sim_ahead for obs_stepsize == action_stepsize:
    unwrapped carry, c == 1.0 stages reading the next action, trajectory
    observations including the initial one."""
    env = env_cls(batch_size=BATCH, solver=solver)
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(9), BATCH))
    actions = jax.random.uniform(
        jax.random.PRNGKey(10), (BATCH, T, env.action_dim), minval=-0.7, maxval=0.7
    )
    obs_ref, _, last_ref = env.vmap_sim_ahead(state, actions, env.tau, env.tau)
    obs_fused, last_fused = env_fused_sim_ahead(
        env, state, actions, env.tau, env.tau, interpret=True
    )
    assert obs_fused.shape == obs_ref.shape
    np.testing.assert_allclose(np.asarray(obs_fused), np.asarray(obs_ref), rtol=1e-10, atol=1e-10)
    for name in env._ode_state_fields:
        np.testing.assert_allclose(
            np.asarray(getattr(last_fused.physical_state, name)),
            np.asarray(getattr(last_ref.physical_state, name)),
            rtol=1e-10,
            atol=1e-10,
        )


@pytest.mark.parametrize("env_cls,solver,ratio", [
    (excenvs.Pendulum, "euler", 2),
    (excenvs.Pendulum, "rk4", 4),
    (excenvs.CartPole, "tsit5", 3),
])
@pytest.mark.slow
def test_fused_sim_ahead_finer_obs_grid(env_cls, solver, ratio):
    """obs_stepsize < action_stepsize runs IN the kernel: the solver steps on
    the observation grid and each action is streamed for `ratio` consecutive
    steps (reference ZOH semantics, core_env.py:447-448)."""
    env = env_cls(batch_size=BATCH, solver=solver)
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(11), BATCH))
    actions = jax.random.uniform(
        jax.random.PRNGKey(12), (BATCH, 8, env.action_dim), minval=-0.7, maxval=0.7
    )
    obs_ref, _, last_ref = env.vmap_sim_ahead(state, actions, env.tau / ratio, env.tau)
    obs, last = env_fused_sim_ahead(
        env, state, actions, env.tau / ratio, env.tau, interpret=True
    )
    assert obs.shape == obs_ref.shape == (BATCH, 1 + 8 * ratio, obs_ref.shape[-1])
    np.testing.assert_allclose(np.asarray(obs), np.asarray(obs_ref), rtol=1e-10, atol=1e-10)
    for name in env._ode_state_fields:
        np.testing.assert_allclose(
            np.asarray(getattr(last.physical_state, name)),
            np.asarray(getattr(last_ref.physical_state, name)),
            rtol=1e-10,
            atol=1e-10,
        )


def test_fused_sim_ahead_fallback_noninteger_ratio():
    """A non-integral action/obs stepsize ratio falls back to the scan path
    (and strict=True raises instead of silently falling back)."""
    env = excenvs.Pendulum(batch_size=BATCH)
    _, state = env.vmap_reset()
    actions = 0.2 * jnp.ones((BATCH, 4, 1))
    obs_ref, _, _ = env.vmap_sim_ahead(state, actions, env.tau / 2.5, env.tau)
    obs, _ = env_fused_sim_ahead(env, state, actions, env.tau / 2.5, env.tau, interpret=True)
    np.testing.assert_array_equal(np.asarray(obs), np.asarray(obs_ref))
    with pytest.raises(ValueError, match="strict"):
        env_fused_sim_ahead(env, state, actions, env.tau / 2.5, env.tau, strict=True)


def test_fused_rollout_strict_raises():
    """strict=True raises out of kernel scope instead of silently scanning."""
    env = excenvs.Pendulum(batch_size=48)  # not a multiple of the 1024 tile
    _, state = env.vmap_reset()
    actions = 0.2 * jnp.ones((48, 4, 1))
    with pytest.raises(ValueError, match="strict"):
        env_fused_rollout(env, state, actions, strict=True)


def test_fused_trajectory_output():
    """Strided in-kernel trajectory saves must equal the scan path's strided
    observations (and the final state)."""
    env = excenvs.Pendulum(batch_size=BATCH)
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(3), BATCH))
    actions = jax.random.uniform(jax.random.PRNGKey(4), (BATCH, T, 1), minval=-0.9, maxval=0.9)

    obs_ref, last_ref = env.vmap_rollout(state, actions, 4)  # every 4th obs
    obs_fused, last_fused = env_fused_rollout(env, state, actions, obs_stride=4, interpret=True)

    assert obs_fused.shape == (BATCH, T // 4, 2)
    np.testing.assert_allclose(np.asarray(obs_fused), np.asarray(obs_ref), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(last_fused.physical_state.omega),
        np.asarray(last_ref.physical_state.omega),
        rtol=1e-12,
    )


def test_fused_raw_api_bad_batch():
    with pytest.raises(ValueError, match="multiple"):
        fused_rollout(
            lambda t, y, a: y,
            Euler(),
            (jnp.ones(100),),
            jnp.ones((100, 4, 1)),
            4,
            1e-3,
            (False,),
            interpret=True,
        )


@pytest.mark.slow
def test_pendulum_fast_math_kernel():
    """Fast-math kernel (poly sin + floor wrap) tracks the exact path within
    the documented tolerance, and fast-math primitives match their exact
    counterparts at the float32 rounding level."""
    from exciting_environments_tpu.ops.fastmath import poly_sin, poly_sin_max_error, wrap_angle_fast
    from exciting_environments_tpu.ops.pallas.pendulum_fast import pendulum_fast_rollout

    assert poly_sin_max_error() < 5e-7

    x = jnp.linspace(-jnp.pi + 1e-6, jnp.pi, 1001, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(poly_sin(x)), np.sin(np.asarray(x)), atol=5e-7)
    wrapped = wrap_angle_fast(jnp.linspace(-9.0, 9.0, 1001))
    ref = ((jnp.linspace(-9.0, 9.0, 1001) + jnp.pi) % (2 * jnp.pi)) - jnp.pi
    np.testing.assert_allclose(np.asarray(wrapped), np.asarray(ref), atol=1e-5)

    env = excenvs.Pendulum(batch_size=128, tau=1e-4)
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), 128))
    actions = jax.random.uniform(jax.random.PRNGKey(1), (128, 64, 1), minval=-1.0, maxval=1.0)
    th, om = pendulum_fast_rollout(env, state, actions, chunk=8, interpret=True)
    _, last = env.vmap_rollout(state, actions, 64)
    np.testing.assert_allclose(np.asarray(th), np.asarray(last.physical_state.theta), atol=1e-4)
    np.testing.assert_allclose(np.asarray(om), np.asarray(last.physical_state.omega), atol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("env_cls,fast", [(excenvs.Pendulum, False), (excenvs.CartPole, True)])
def test_fused_time_major_layout(env_cls, fast):
    """(T, B, A) actions produce bit-identical results to (B, T, A)."""
    env = env_cls(batch_size=BATCH, fast_math=fast)
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(2), BATCH))
    actions = jax.random.uniform(jax.random.PRNGKey(3), (BATCH, T, 1), minval=-0.9, maxval=0.9)
    obs, last = env_fused_rollout(env, state, actions, interpret=True)
    obs_tm, last_tm = env_fused_rollout(
        env, state, jnp.transpose(actions, (1, 0, 2)), time_major=True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(obs_tm), np.asarray(obs))
    for name in env._ode_state_fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(last_tm.physical_state, name)),
            np.asarray(getattr(last.physical_state, name)),
        )


def test_fused_time_major_with_obs_stride():
    """Strided trajectory output composes with the time-major layout."""
    env = excenvs.Pendulum(batch_size=BATCH)
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(3), BATCH))
    actions = jax.random.uniform(jax.random.PRNGKey(4), (BATCH, T, 1), minval=-0.9, maxval=0.9)
    obs, last = env_fused_rollout(env, state, actions, obs_stride=4, interpret=True)
    obs_tm, last_tm = env_fused_rollout(
        env, state, jnp.transpose(actions, (1, 0, 2)), obs_stride=4, time_major=True, interpret=True
    )
    assert obs_tm.shape == (BATCH, T // 4, 2)
    np.testing.assert_array_equal(np.asarray(obs_tm), np.asarray(obs))
    np.testing.assert_array_equal(
        np.asarray(last_tm.physical_state.theta), np.asarray(last.physical_state.theta)
    )


@pytest.mark.slow
def test_fused_time_major_fallback_matches():
    """Out-of-scope envs transpose back and use the scan path."""
    from exciting_environments_tpu.ops.solvers import ImplicitEuler

    env = excenvs.Pendulum(batch_size=BATCH, solver=ImplicitEuler())  # not explicit RK -> fallback
    assert not supports_fused_rollout(env)
    _, state = env.vmap_reset()
    actions = 0.2 * jnp.ones((BATCH, T, 1))
    obs, _ = env_fused_rollout(env, state, actions, interpret=True)
    obs_tm, _ = env_fused_rollout(
        env, state, jnp.transpose(actions, (1, 0, 2)), time_major=True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(obs_tm), np.asarray(obs))


def test_fallback_non_explicit_solver():
    """Implicit solvers are outside the kernel's scope."""
    from exciting_environments_tpu.ops.solvers import ImplicitEuler

    env = excenvs.Pendulum(batch_size=BATCH, solver=ImplicitEuler())
    assert not supports_fused_rollout(env)


def test_pendulum_fast_time_major_layout():
    """Time-major action input (no per-call transpose) is bit-identical to
    the batch-major path."""
    from exciting_environments_tpu.ops.pallas.pendulum_fast import pendulum_fast_rollout

    env = excenvs.Pendulum(batch_size=128, tau=1e-4)
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), 128))
    actions = jax.random.uniform(jax.random.PRNGKey(1), (128, 64, 1), minval=-1.0, maxval=1.0)
    th, om = pendulum_fast_rollout(env, state, actions, chunk=8, interpret=True)
    th_tm, om_tm = pendulum_fast_rollout(
        env, state, jnp.transpose(actions, (1, 0, 2)), chunk=8, time_major=True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(th_tm), np.asarray(th))
    np.testing.assert_array_equal(np.asarray(om_tm), np.asarray(om))


def test_fast_sign_matches_sign():
    from exciting_environments_tpu.ops.fastmath import fast_sign

    x = jnp.array([-3.0, -1e-20, 0.0, 1e-20, 8.0])
    np.testing.assert_array_equal(np.asarray(fast_sign(x)), np.sign(np.asarray(x)))


@pytest.mark.parametrize("env_cls", [excenvs.CartPole, excenvs.Acrobot])
def test_fused_matches_scan_fast_math(env_cls):
    """fast_math envs run poly trig + floor wrap + clamp sign INSIDE the fused
    kernel, identically to their fast scan path."""
    env, obs_ref, last_ref, obs_fused, last_fused = _rollout_pair(env_cls, Euler(), fast_math=True)
    assert supports_fused_rollout(env)
    np.testing.assert_allclose(np.asarray(obs_fused), np.asarray(obs_ref), rtol=1e-12, atol=1e-12)
    for name in env._ode_state_fields:
        np.testing.assert_allclose(
            np.asarray(getattr(last_fused.physical_state, name)),
            np.asarray(getattr(last_ref.physical_state, name)),
            rtol=1e-12,
            atol=1e-12,
        )


@pytest.mark.slow
@pytest.mark.parametrize("env_cls", [excenvs.Pendulum, excenvs.CartPole, excenvs.Acrobot])
def test_env_fast_math_flag(env_cls):
    """fast_math envs track the exact envs within polynomial-error tolerance
    across all rollout paths."""
    B, T = 64, 100
    exact = env_cls(batch_size=B)
    fast = env_cls(batch_size=B, fast_math=True)
    assert fast.fast_math and not exact.fast_math
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    _, s_e = exact.vmap_reset(keys)
    _, s_f = fast.vmap_reset(keys)
    actions = jax.random.uniform(jax.random.PRNGKey(1), (B, T, exact.action_dim), minval=-0.8, maxval=0.8)
    _, last_e = exact.vmap_rollout(s_e, actions, T)
    _, last_f = fast.vmap_rollout(s_f, actions, T)
    for name in exact._ode_state_fields:
        a = np.asarray(getattr(last_f.physical_state, name))
        b = np.asarray(getattr(last_e.physical_state, name))
        if name in exact._angle_fields:
            d = np.abs(((a - b) + np.pi) % (2 * np.pi) - np.pi)
        else:
            d = np.abs(a - b)
        assert d.max() < 1e-2, f"{name}: {d.max()}"


def test_env_method_delegation():
    """CoreEnvironment.fused_rollout / fused_sim_ahead delegate to the kernels."""
    env = excenvs.Pendulum(batch_size=BATCH)
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(11), BATCH))
    actions = jax.random.uniform(jax.random.PRNGKey(12), (BATCH, T, 1), minval=-0.9, maxval=0.9)
    obs_m, last_m = env.fused_rollout(state, actions, interpret=True)
    obs_f, last_f = env_fused_rollout(env, state, actions, interpret=True)
    np.testing.assert_array_equal(np.asarray(obs_m), np.asarray(obs_f))
    obs_sa_m, _ = env.fused_sim_ahead(state, actions, env.tau, env.tau, interpret=True)
    obs_sa_f, _ = env_fused_sim_ahead(env, state, actions, env.tau, env.tau, interpret=True)
    np.testing.assert_array_equal(np.asarray(obs_sa_m), np.asarray(obs_sa_f))


@pytest.mark.slow
def test_fused_closed_loop_matches_scan_policy():
    """The policy-in-kernel closed loop equals a scan closed loop driving the
    same PD arithmetic through vmap_step (reference semantics bar: the
    GymWrapper loop, gym_wrapper.py:88-130)."""
    from exciting_environments_tpu.core import structures
    from exciting_environments_tpu.ops.pallas.stepper import (
        env_fused_closed_loop,
        supports_fused_closed_loop,
    )

    env = excenvs.Pendulum(batch_size=BATCH, control_state=["theta"])
    assert supports_fused_closed_loop(env)
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(20), BATCH))
    s0 = structures.replace(
        s0, reference=structures.replace(s0.reference, theta=jnp.linspace(-1.5, 1.5, BATCH))
    )

    def policy_tile(obs, t):
        return (-0.9 * (obs[0] - obs[2]) - 0.25 * obs[1],)

    obs_f, acts_f, last_f = env_fused_closed_loop(
        env, s0, policy_tile, 12, obs_stride=1, interpret=True
    )

    in_ax = env.in_axes_env_properties
    obs0 = jax.vmap(env.generate_observation, in_axes=(0, in_ax))(s0, env.env_properties)
    step_b = jax.vmap(env.step, in_axes=(0, 0, in_ax))

    def body(carry, _):
        state, obs = carry
        a = (-0.9 * (obs[:, 0] - obs[:, 2]) - 0.25 * obs[:, 1])[:, None]
        obs, state = step_b(state, a, env.env_properties)
        return (state, obs), (obs, a)

    (last_s, _), (obs_s, acts_s) = jax.lax.scan(body, (s0, obs0), None, length=12)
    obs_s = jnp.swapaxes(obs_s, 0, 1)
    acts_s = jnp.swapaxes(acts_s, 0, 1)
    np.testing.assert_allclose(np.asarray(obs_f), np.asarray(obs_s), rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(acts_f), np.asarray(acts_s), rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(last_f.physical_state.theta),
        np.asarray(last_s.physical_state.theta), rtol=1e-10, atol=1e-10,
    )

    # final-only mode + out-of-scope raises (no open-loop fallback exists)
    obs_fin, _ = env_fused_closed_loop(env, s0, policy_tile, 12, interpret=True)
    np.testing.assert_allclose(np.asarray(obs_fin), np.asarray(obs_s[:, -1]), rtol=1e-10, atol=1e-10)
    small = excenvs.Pendulum(batch_size=8)
    _, ss = small.vmap_reset()
    with pytest.raises(ValueError, match="scope"):
        env_fused_closed_loop(small, ss, policy_tile, 4)
    with pytest.raises(ValueError, match="requires obs_stride"):
        env_fused_closed_loop(env, s0, policy_tile, 12, interpret=True, return_traj_states=True)


@pytest.mark.slow
def test_fused_closed_loop_stateful_policy_matches_scan():
    """policy_carry makes the in-kernel policy STATEFUL: a PI tracking law
    (integrator carried between steps in VMEM) equals the same law threaded
    through a scan closed loop, including the returned final carry."""
    from exciting_environments_tpu.core import structures
    from exciting_environments_tpu.ops.pallas.stepper import env_fused_closed_loop

    env = excenvs.Pendulum(batch_size=BATCH, control_state=["theta"])
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(21), BATCH))
    s0 = structures.replace(
        s0, reference=structures.replace(s0.reference, theta=jnp.linspace(-1.0, 1.0, BATCH))
    )
    T = 12
    kp_, ki_, kd_ = 0.7, 0.08, 0.2

    def policy_tile(obs, t, carry):
        e = obs[2] - obs[0]
        integ = carry[0] + ki_ * e
        return (kp_ * e + integ - kd_ * obs[1],), (integ,)

    carry0 = (jnp.zeros(BATCH),)
    obs_f, acts_f, last_f, fc = env_fused_closed_loop(
        env, s0, policy_tile, T, obs_stride=1, interpret=True, policy_carry=carry0
    )

    in_ax = env.in_axes_env_properties
    obs0 = jax.vmap(env.generate_observation, in_axes=(0, in_ax))(s0, env.env_properties)
    step_b = jax.vmap(env.step, in_axes=(0, 0, in_ax))

    def body(carry, _):
        state, obs, integ = carry
        e = obs[:, 2] - obs[:, 0]
        integ = integ + ki_ * e
        a = (kp_ * e + integ - kd_ * obs[:, 1])[:, None]
        obs, state = step_b(state, a, env.env_properties)
        return (state, obs, integ), (obs, a)

    (last_s, _, integ_s), (obs_s, acts_s) = jax.lax.scan(
        body, (s0, obs0, carry0[0]), None, length=T
    )
    np.testing.assert_allclose(
        np.asarray(obs_f), np.asarray(jnp.swapaxes(obs_s, 0, 1)), rtol=1e-10, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(acts_f), np.asarray(jnp.swapaxes(acts_s, 0, 1)), rtol=1e-10, atol=1e-10
    )
    np.testing.assert_allclose(np.asarray(fc[0]), np.asarray(integ_s), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(last_f.physical_state.theta),
        np.asarray(last_s.physical_state.theta), rtol=1e-10, atol=1e-10,
    )

    # final-only mode returns (obs, final_state, final_carry)
    obs_fin, last_fin, fc2 = env_fused_closed_loop(
        env, s0, policy_tile, T, interpret=True, policy_carry=carry0
    )
    np.testing.assert_allclose(np.asarray(fc2[0]), np.asarray(integ_s), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(obs_fin), np.asarray(obs_s[-1]), rtol=1e-10, atol=1e-10
    )


def test_fused_closed_loop_fsal_state_structure_parity():
    """For FSAL solvers the closed loop's final state must carry the
    reconstructed solver carry like every other fused path — not None —
    so its pytree structure matches the reset/scan state and survives
    lax.scan carries, state stacking, and checkpoint round-trips."""
    from exciting_environments_tpu.core import structures
    from exciting_environments_tpu.ops.pallas.stepper import env_fused_closed_loop

    env = excenvs.Pendulum(batch_size=BATCH, solver="tsit5", control_state=["theta"])
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(21), BATCH))
    s0 = structures.replace(
        s0, reference=structures.replace(s0.reference, theta=jnp.linspace(-1.0, 1.0, BATCH))
    )

    def policy_tile(obs, t):
        return (-0.9 * (obs[0] - obs[2]) - 0.25 * obs[1],)

    ref_struct = jax.tree_util.tree_structure(s0)
    # trajectory mode: carry reconstructed from the last SAVED action (exact)
    _, _, last_traj = env_fused_closed_loop(env, s0, policy_tile, 8, obs_stride=1, interpret=True)
    assert jax.tree_util.tree_structure(last_traj) == ref_struct
    # final-only mode: carry evaluated under the policy's final-state action
    # (structurally identical; the value is informational — step() re-inits)
    _, last_fin = env_fused_closed_loop(env, s0, policy_tile, 8, interpret=True)
    assert jax.tree_util.tree_structure(last_fin) == ref_struct

    # the trajectory-mode carry must equal the scan path's f(t1, y1) under
    # the last taken action
    in_ax = env.in_axes_env_properties
    obs0 = jax.vmap(env.generate_observation, in_axes=(0, in_ax))(s0, env.env_properties)
    step_b = jax.vmap(env.step, in_axes=(0, 0, in_ax))

    def body(carry, _):
        state, obs = carry
        a = (-0.9 * (obs[:, 0] - obs[:, 2]) - 0.25 * obs[:, 1])[:, None]
        obs, state = step_b(state, a, env.env_properties)
        return (state, obs), None

    (last_s, _), _ = jax.lax.scan(body, (s0, obs0), None, length=8)
    for a, b in zip(
        jax.tree_util.tree_leaves(last_traj.additions.solver_state),
        jax.tree_util.tree_leaves(last_s.additions.solver_state),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10)


@pytest.mark.slow
def test_fused_closed_loop_per_batch_params():
    """Domain-randomized closed loop: (batch,)-shaped heterogeneous parameter
    leaves stream as tile operands in the CLOSED-loop kernel too — one policy
    controls a batch of physically different plants, matching the scan loop,
    and policy-parameter gradients average over the plant distribution."""
    from exciting_environments_tpu.core import structures
    from exciting_environments_tpu.ops.pallas.stepper import (
        env_fused_closed_loop,
        supports_fused_closed_loop,
    )

    lengths = 1.0 + jnp.arange(BATCH) / BATCH  # l in [1, 2)
    env = excenvs.Pendulum(
        batch_size=BATCH, control_state=["theta"],
        static_params={"l": lengths, "g": 9.81, "m": 1},
    )
    assert supports_fused_closed_loop(env)
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(40), BATCH))
    s0 = structures.replace(
        s0, reference=structures.replace(s0.reference, theta=jnp.linspace(-1, 1, BATCH))
    )

    def policy(obs, t, p):
        return (-p["kp"] * (obs[0] - obs[2]) - p["kd"] * obs[1],)

    params = {"kp": jnp.asarray(0.8), "kd": jnp.asarray(0.3)}

    def loss_fused(p):
        obs, acts, _ = env_fused_closed_loop(
            env, s0, policy, 10, obs_stride=1, interpret=True, policy_params=p
        )
        return jnp.mean((obs[:, :, 0] - obs[:, :, 2]) ** 2)

    in_ax = env.in_axes_env_properties
    obs0 = jax.vmap(env.generate_observation, in_axes=(0, in_ax))(s0, env.env_properties)
    step_b = jax.vmap(env.step, in_axes=(0, 0, in_ax))

    def loss_scan(p):
        def body(carry, _):
            st, obs = carry
            a = (-p["kp"] * (obs[:, 0] - obs[:, 2]) - p["kd"] * obs[:, 1])[:, None]
            obs, st = step_b(st, a, env.env_properties)
            return (st, obs), obs

        (_, _), obs_t = jax.lax.scan(body, (s0, obs0), None, length=10)
        obs_t = jnp.swapaxes(obs_t, 0, 1)
        return jnp.mean((obs_t[:, :, 0] - obs_t[:, :, 2]) ** 2)

    lf, ls = float(loss_fused(params)), float(loss_scan(params))
    assert abs(lf - ls) <= 1e-10 * max(abs(ls), 1e-10)
    gf = jax.grad(loss_fused)(params)
    gs = jax.grad(loss_scan)(params)
    for k in params:
        assert abs(float(gf[k]) - float(gs[k])) <= 1e-9 * max(abs(float(gs[k])), 1e-9), k
