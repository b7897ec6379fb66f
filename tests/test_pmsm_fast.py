"""Trig-free PMSM fast rollout vs the exact step path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.ops.pmsm_fast import hex_clip_fast, pmsm_linear_fast_rollout
from exciting_environments_tpu.ops.transforms import apply_hex_constraint


def test_hex_clip_fast_matches_exact():
    """The linear sign-test + multilinear-table clip must reproduce the
    trig-based hexagon clip exactly (same sector bits, same rotations)."""
    rng = np.random.default_rng(0)
    pts = rng.uniform(-2.0, 2.0, size=(500, 2))
    a, b = hex_clip_fast(jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]))
    for i in range(0, 500, 7):
        ref = np.asarray(apply_hex_constraint(jnp.array(pts[i])))[0]
        np.testing.assert_allclose(float(a[i]), ref[0], atol=1e-5)
        np.testing.assert_allclose(float(b[i]), ref[1], atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("deadtime", [0, 1])
def test_fast_rollout_matches_exact_path(deadtime):
    B, T = 256, 200
    params = {"p": 3, "r_s": 15e-3, "l_d": 0.37e-3, "l_q": 1.2e-3,
              "psi_p": 65.6e-3, "u_dc": 400, "deadtime": deadtime}
    env = excenvs.PMSM(batch_size=B, static_params=params)
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B))
    actions = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 2), minval=-0.4, maxval=0.4)

    _, last_exact = env.vmap_rollout(state, actions, T)
    last_fast = pmsm_linear_fast_rollout(env, state, actions)

    for name, tol in [("i_d", 1e-2), ("i_q", 1e-2), ("torque", 1e-1),
                      ("u_d_buffer", 1e-1), ("u_q_buffer", 1e-1)]:
        a = np.asarray(getattr(last_fast.physical_state, name))
        b = np.asarray(getattr(last_exact.physical_state, name))
        scale = max(1.0, np.abs(b).max())
        assert np.max(np.abs(a - b)) / scale < tol, f"{name}: {np.max(np.abs(a-b))} vs scale {scale}"
    # epsilon modulo 2*pi
    deps = np.asarray(
        ((last_fast.physical_state.epsilon - last_exact.physical_state.epsilon) + jnp.pi)
        % (2 * jnp.pi)
        - jnp.pi
    )
    assert np.max(np.abs(deps)) < 1e-3


def test_fast_rollout_time_major_identical():
    from exciting_environments_tpu.ops.signals import to_time_major

    B, T = 256, 64
    params = {"p": 3, "r_s": 15e-3, "l_d": 0.37e-3, "l_q": 1.2e-3,
              "psi_p": 65.6e-3, "u_dc": 400, "deadtime": 0}
    env = excenvs.PMSM(batch_size=B, static_params=params)
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B))
    actions = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 2), minval=-0.4, maxval=0.4)
    last = pmsm_linear_fast_rollout(env, state, actions)
    last_tm = pmsm_linear_fast_rollout(env, state, to_time_major(actions), time_major=True)
    for name in ("i_d", "i_q", "epsilon", "torque"):
        np.testing.assert_array_equal(
            np.asarray(getattr(last_tm.physical_state, name)),
            np.asarray(getattr(last.physical_state, name)),
        )


def test_fast_rollout_scope_checks():
    env = excenvs.PMSM(batch_size=8, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA)
    _, st = env.vmap_reset()
    with pytest.raises(ValueError, match="linear"):
        pmsm_linear_fast_rollout(env, st, jnp.zeros((8, 4, 2)))
    env2 = excenvs.PMSM(batch_size=8, solver="tsit5")
    _, st2 = env2.vmap_reset()
    with pytest.raises(ValueError, match="Euler"):
        pmsm_linear_fast_rollout(env2, st2, jnp.zeros((8, 4, 2)))


@pytest.mark.slow
def test_fast_rollout_saturated_matches_exact():
    import exciting_environments_tpu as excenvs
    from exciting_environments_tpu.ops.pmsm_fast import pmsm_fast_rollout

    B, T = 128, 150
    env = excenvs.PMSM(batch_size=B, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA)
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(2), B))
    actions = jax.random.uniform(jax.random.PRNGKey(3), (B, T, 2), minval=-0.3, maxval=0.3)

    _, last_exact = env.vmap_rollout(state, actions, T)
    last_fast = pmsm_fast_rollout(env, state, actions)

    for name, tol in [("i_d", 2e-2), ("i_q", 2e-2), ("torque", 1e-1)]:
        a = np.asarray(getattr(last_fast.physical_state, name))
        b = np.asarray(getattr(last_exact.physical_state, name))
        scale = max(1.0, np.abs(b).max())
        assert np.max(np.abs(a - b)) / scale < tol, f"{name}: {np.max(np.abs(a-b))} vs {scale}"
