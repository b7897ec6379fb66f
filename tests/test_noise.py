"""Stochastic simulation (process + observation noise): statistics, key
threading, determinism, and the deterministic-path guards.

The reference is deterministic everywhere; noise is a TPU-native addition
gated off by default — golden-fixture parity tests pin that the default
path is untouched."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.ops.adaptive import adaptive_rollout
from exciting_environments_tpu.ops.pallas import rollout_path

B = 4096
TAU = 1e-2
KEYS = jax.random.split(jax.random.PRNGKey(0), B)


def _reset(env):
    return env.vmap_reset(KEYS)[1]


def test_process_noise_statistics_and_key_threading():
    env = excenvs.Pendulum(batch_size=B, tau=TAU, process_noise={"omega": 0.5})
    det = excenvs.Pendulum(batch_size=B, tau=TAU)
    st = _reset(env)
    _, st1 = env.vmap_step(st, jnp.zeros((B, 1)))
    _, sd1 = det.vmap_step(_reset(det), jnp.zeros((B, 1)))

    # the key advanced (fresh draws next step) ...
    assert not np.array_equal(np.asarray(st.PRNGKey), np.asarray(st1.PRNGKey))
    # ... and the increment beyond the deterministic step is N(0, sigma^2 tau)
    d = np.asarray(st1.physical_state.omega) - np.asarray(sd1.physical_state.omega)
    expected = 0.5 * np.sqrt(TAU)
    assert abs(d.std() / expected - 1.0) < 0.1
    assert abs(d.mean()) < 5 * expected / np.sqrt(B)
    # theta carries no direct noise in one step
    dt = np.asarray(st1.physical_state.theta) - np.asarray(sd1.physical_state.theta)
    assert np.abs(dt).max() < 1e-12

    # variance accumulates ~linearly along a rollout (Brownian scaling)
    _, f32 = env.vmap_rollout(st, jnp.zeros((B, 32, 1)))
    _, f128 = env.vmap_rollout(st, jnp.zeros((B, 128, 1)))
    _, d32 = det.vmap_rollout(_reset(det), jnp.zeros((B, 32, 1)))
    _, d128 = det.vmap_rollout(_reset(det), jnp.zeros((B, 128, 1)))
    v32 = np.var(np.asarray(f32.physical_state.omega) - np.asarray(d32.physical_state.omega))
    v128 = np.var(np.asarray(f128.physical_state.omega) - np.asarray(d128.physical_state.omega))
    # damping-free pendulum: omega variance grows superlinearly-ish but the
    # ratio must be far from 1 and finite; loose band around 4x
    assert 2.0 < v128 / v32 < 12.0


def test_same_keys_reproduce_different_keys_differ():
    env = excenvs.Pendulum(batch_size=B, tau=TAU, process_noise={"omega": 0.5})
    st = _reset(env)
    _, a = env.vmap_rollout(st, jnp.zeros((B, 16, 1)))
    _, b = env.vmap_rollout(st, jnp.zeros((B, 16, 1)))
    np.testing.assert_array_equal(
        np.asarray(a.physical_state.omega), np.asarray(b.physical_state.omega)
    )
    # identical physical state, different PRNG keys -> different noise stream
    from exciting_environments_tpu.core import structures

    st2 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(1), B))[1]
    st_otherkeys = structures.replace(st, PRNGKey=st2.PRNGKey)
    _, c = env.vmap_rollout(st_otherkeys, jnp.zeros((B, 16, 1)))
    assert not np.array_equal(
        np.asarray(a.physical_state.omega), np.asarray(c.physical_state.omega)
    )


def test_observation_noise_statistics_and_exact_state():
    env = excenvs.Pendulum(batch_size=B, tau=TAU, observation_noise={"theta": 0.05})
    st = _reset(env)
    obs, st1 = env.vmap_step(st, jnp.zeros((B, 1)))
    clean = jax.vmap(env.generate_observation, in_axes=(0, env.in_axes_env_properties))(
        st1, env.env_properties
    )
    d = np.asarray(obs - clean)
    # theta column: sigma scaled into normalized units by the span 2*pi
    expected = 2 * 0.05 / (2 * np.pi)
    assert abs(d[:, 0].std() / expected - 1.0) < 0.1
    # omega column exact up to cross-program fusion drift (CPU ~1 ulp)
    assert np.abs(d[:, 1]).max() < 1e-12
    # the underlying state is untouched by sensor noise: a deterministic twin
    # stepping the same physical state matches to fusion drift
    det = excenvs.Pendulum(batch_size=B, tau=TAU)
    _, sd1 = det.vmap_step(_reset(det), jnp.zeros((B, 1)))
    np.testing.assert_allclose(
        np.asarray(st1.physical_state.theta), np.asarray(sd1.physical_state.theta),
        rtol=0, atol=1e-12,
    )


@pytest.mark.slow
def test_noise_works_through_the_learning_stack():
    # step_with_flags / PPO consume vmap_step, so the stochastic env drops in
    from exciting_environments_tpu.utils.rl import PPOConfig, train_ppo

    env = excenvs.Pendulum(
        batch_size=8,
        tau=2e-2,
        control_state=["theta"],
        process_noise={"omega": 0.2},
        observation_noise={"theta": 0.02},
    )
    cfg = PPOConfig(n_steps=16, n_epochs=2, n_minibatches=4, max_episode_steps=32)
    res = train_ppo(env, iterations=2, key=jax.random.PRNGKey(0), config=cfg)
    for name, v in res.metrics.items():
        assert v.shape == (2,) and np.isfinite(v).all(), name


def test_deterministic_paths_guard():
    env = excenvs.Pendulum(batch_size=1024, tau=TAU, process_noise={"omega": 0.5})
    st = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), 1024))[1]

    # step-mode rollouts ride the fused kernel (precomputed noise stream);
    # the trajectory solve runs on the scan (Euler–Maruyama, round 4)
    assert rollout_path(env) == "fused"
    assert rollout_path(env, obs_stepsize=TAU, action_stepsize=TAU) == "scan"
    # multistage solvers raise: an RK tableau's intermediate stages have no
    # agreed SDE semantics (stochastic sim_ahead is one-stage only)
    env_ms = excenvs.Pendulum(batch_size=1024, tau=TAU, process_noise={"omega": 0.5}, solver="tsit5")
    st_ms = env_ms.vmap_reset(jax.random.split(jax.random.PRNGKey(0), 1024))[1]
    with pytest.raises(ValueError, match="one-stage"):
        env_ms.vmap_sim_ahead(st_ms, jnp.zeros((1024, 4, 1)), env_ms.tau, env_ms.tau)
    with pytest.raises(ValueError, match="adaptive_rollout"):
        adaptive_rollout(env, st, jnp.zeros((1024, 4, 1)))
    # key-less reset carries the NaN placeholder -> clear trace-time error
    _, nokey = env.vmap_reset()
    with pytest.raises(ValueError, match="PRNG"):
        env.vmap_step(nokey, jnp.zeros((1024, 1)))


@pytest.mark.parametrize("noise_mode", ["exact", "fast"])
def test_stochastic_sim_ahead_matches_step_loop(noise_mode):
    """Round-4: stochastic ``sim_ahead`` (Euler–Maruyama on the obs grid) —
    at ``obs_stepsize == action_stepsize`` it consumes the step path's exact
    per-step key chain in both noise modes; finer observation grids
    integrate the SDE on the finer grid; per-save keys advance."""
    B_, T_ = 64, 20
    env = excenvs.Pendulum(
        batch_size=B_, tau=TAU, process_noise={"omega": 0.8},
        observation_noise={"theta": 0.01}, noise_mode=noise_mode,
    )
    _, st = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B_))
    acts = jax.random.uniform(jax.random.PRNGKey(1), (B_, T_, 1), minval=-0.5, maxval=0.5)
    obs_sa, states, last = env.vmap_sim_ahead(st, acts, env.tau, env.tau)

    s = st
    obs_rows = []
    for t in range(T_):
        o, s = env.vmap_step(s, acts[:, t])
        obs_rows.append(o)
    obs_step = jnp.stack(obs_rows, axis=1)
    np.testing.assert_allclose(
        np.asarray(obs_sa[:, 1:]), np.asarray(obs_step), rtol=1e-10, atol=1e-12
    )
    assert jnp.array_equal(jnp.asarray(last.PRNGKey), jnp.asarray(s.PRNGKey))

    # finer observation grid: SDE on the finer grid, finite throughout
    obs_f, states_f, _ = env.vmap_sim_ahead(st, acts, env.tau / 4, env.tau)
    assert obs_f.shape[1] == 4 * T_ + 1 and np.isfinite(np.asarray(obs_f)).all()
    # per-save keys advance (resume must not replay consumed draws)
    k = jnp.asarray(states.PRNGKey)
    assert not jnp.array_equal(k[:, 4], k[:, 5])

    # the initial row is the exact reset observation (no draw consumed) —
    # closeness-gated: the XLA CPU backend's context-dependent FMA
    # contraction perturbs the same normalization arithmetic by ~1 ulp
    # between compilation contexts (see tests/test_pallas_pmsm.py docstring)
    obs0 = jax.vmap(env.generate_observation, in_axes=(0, env.in_axes_env_properties))(
        st, env.env_properties
    )
    np.testing.assert_allclose(
        np.asarray(obs_sa[:, 0]), np.asarray(obs0), rtol=1e-13, atol=1e-14
    )


def test_stochastic_sim_ahead_clipped_env_stays_physical():
    """The FluidTank's in-ODE clamp plus save-clipping keep the stochastic
    trajectory finite and non-negative under large disturbances."""
    env = excenvs.FluidTank(batch_size=32, process_noise={"height": 0.5})
    _, st = env.vmap_reset(jax.random.split(jax.random.PRNGKey(2), 32))
    obs, _, _ = env.vmap_sim_ahead(st, jnp.zeros((32, 50, 1)), env.tau, env.tau)
    assert np.isfinite(np.asarray(obs)).all() and float(jnp.min(obs)) >= -1e-12


@pytest.mark.parametrize("noise_mode", ["exact", "fast"])
def test_fused_stochastic_rollout_matches_scan(noise_mode):
    """The kernel consumes the scan path's precomputed noise draws (the exact
    split-chain stream, or fast mode's time-parallel counter-style stream):
    states/observations agree to cross-program fusion drift, PRNG keys
    thread identically."""
    from exciting_environments_tpu.ops.pallas.stepper import env_fused_rollout

    B_, T = 1024, 16
    env = excenvs.Pendulum(
        batch_size=B_, tau=TAU,
        process_noise={"omega": 0.5, "theta": 0.05},
        observation_noise={"theta": 0.02},
        noise_mode=noise_mode,
    )
    keys = jax.random.split(jax.random.PRNGKey(0), B_)
    _, st = env.vmap_reset(keys)
    acts = jax.random.uniform(jax.random.PRNGKey(1), (B_, T, 1), minval=-1, maxval=1)

    obs_s, fin_s = env.vmap_rollout(st, acts, obs_stride=4)
    obs_f, fin_f = env_fused_rollout(env, st, acts, obs_stride=4, interpret=True, strict=True)
    np.testing.assert_allclose(np.asarray(obs_f), np.asarray(obs_s), rtol=0, atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(fin_f.physical_state.omega), np.asarray(fin_s.physical_state.omega),
        rtol=0, atol=1e-11,
    )
    np.testing.assert_array_equal(np.asarray(fin_f.PRNGKey), np.asarray(fin_s.PRNGKey))

    # final-observation mode carries the last step's sensor draw too
    obs_f1, _ = env_fused_rollout(env, st, acts, interpret=True, strict=True)
    np.testing.assert_allclose(
        np.asarray(obs_f1), np.asarray(obs_s[:, -1]), rtol=0, atol=1e-11
    )


@pytest.mark.slow
@pytest.mark.parametrize("noise_mode", ["exact", "fast"])
def test_fused_stochastic_rollout_is_differentiable(noise_mode):
    """Reparameterized gradients flow through the noisy kernel path and
    match the scan path (both draw-stream modes)."""
    from exciting_environments_tpu.ops.pallas.stepper import env_fused_rollout

    B_, T = 1024, 16
    env = excenvs.Pendulum(
        batch_size=B_, tau=TAU, process_noise={"omega": 0.5}, noise_mode=noise_mode
    )
    _, st = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B_))
    acts = jax.random.uniform(jax.random.PRNGKey(1), (B_, T, 1), minval=-1, maxval=1)

    def loss(rollout):
        def f(a):
            _, fin = rollout(a)
            return jnp.sum(fin.physical_state.omega ** 2)
        return f

    gf = jax.grad(loss(lambda a: env_fused_rollout(env, st, a, interpret=True, strict=True)))(acts)
    gs = jax.grad(loss(lambda a: env.vmap_rollout(st, a)))(acts)
    rel = np.abs(np.asarray(gf - gs)).max() / np.abs(np.asarray(gs)).max()
    assert rel < 1e-9, rel


@pytest.mark.parametrize("noise_mode", ["exact", "fast"])
def test_stochastic_closed_loop_kernel_matches_scan(noise_mode):
    """Output-feedback control under sensor noise at kernel speed: the
    closed-loop kernel streams the pre-scaled draw slabs and the POLICY acts
    on the noisy measurements — draw-identical to the slab-consuming scan
    fallback (``tile_policy_scan``) in both noise modes, including the final
    and per-save PRNG keys."""
    from exciting_environments_tpu.ops.pallas.stepper import (
        env_fused_closed_loop,
        supports_fused_closed_loop,
    )
    from exciting_environments_tpu.utils.collect import tile_policy_scan

    B_, T = 1024, 16
    env = excenvs.Pendulum(
        batch_size=B_, tau=TAU,
        process_noise={"omega": 0.4},
        observation_noise={"theta": 0.05, "omega": 0.02},
        noise_mode=noise_mode,
    )
    assert supports_fused_closed_loop(env)
    _, st = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B_))

    def pol(obs, t):
        return (-0.8 * obs[0] - 0.3 * obs[1],)

    obs_f, acts_f, traj_f, last_f = env_fused_closed_loop(
        env, st, pol, T, obs_stride=1, interpret=True, return_traj_states=True
    )
    obs_s, acts_s, traj_s, last_s = tile_policy_scan(
        env, st, T, pol, None, collect_trajectory=True
    )
    np.testing.assert_allclose(np.asarray(obs_f), np.asarray(obs_s), rtol=0, atol=1e-11)
    np.testing.assert_allclose(np.asarray(acts_f), np.asarray(acts_s), rtol=0, atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(last_f.physical_state.omega),
        np.asarray(last_s.physical_state.omega), rtol=0, atol=1e-11,
    )
    # PRNG keys thread identically: final state and every saved state
    np.testing.assert_array_equal(np.asarray(last_f.PRNGKey), np.asarray(last_s.PRNGKey))
    np.testing.assert_array_equal(
        np.asarray(traj_f.PRNGKey),
        np.swapaxes(np.asarray(traj_s.PRNGKey), 0, 1)
        if np.asarray(traj_s.PRNGKey).shape[0] == T
        else np.asarray(traj_s.PRNGKey),
    )

    # final-only mode carries the last step's sensor draw too
    obs_fin, _ = env_fused_closed_loop(env, st, pol, T, interpret=True)
    np.testing.assert_allclose(
        np.asarray(obs_fin), np.asarray(obs_s[:, -1]), rtol=0, atol=1e-11
    )


@pytest.mark.slow
def test_stochastic_closed_loop_kernel_gradients_and_stateful():
    """The checkpointed-recompute VJP extends through the streamed noise
    slabs: gradients w.r.t. policy parameters match the scan fallback, and a
    STATEFUL policy's carry threads identically under noise (noise-robust
    controller tuning at kernel speed)."""
    from exciting_environments_tpu.ops.pallas.stepper import env_fused_closed_loop
    from exciting_environments_tpu.utils.collect import tile_policy_scan

    B_, T = 1024, 16
    env = excenvs.Pendulum(
        batch_size=B_, tau=TAU,
        process_noise={"omega": 0.3}, observation_noise={"theta": 0.04},
    )
    _, st = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B_))
    p0 = {"kp": jnp.asarray(0.7), "kd": jnp.asarray(0.2)}

    def pol(obs, t, p):
        return (-p["kp"] * obs[0] - p["kd"] * obs[1],)

    def loss_kernel(p):
        obs, acts, _ = env_fused_closed_loop(
            env, st, pol, T, obs_stride=1, interpret=True, policy_params=p
        )
        return jnp.mean(obs[:, :, 0] ** 2) + 0.01 * jnp.mean(acts**2)

    def loss_scan(p):
        obs, acts, _, _ = tile_policy_scan(env, st, T, pol, p, collect_trajectory=True)
        return jnp.mean(obs[:, :, 0] ** 2) + 0.01 * jnp.mean(acts**2)

    lk, gk = jax.value_and_grad(loss_kernel)(p0)
    ls, gs = jax.value_and_grad(loss_scan)(p0)
    assert abs(float(lk - ls)) < 1e-12
    for k in p0:
        assert abs(float(gk[k] - gs[k])) < 1e-9 * max(1.0, abs(float(gs[k]))), k

    # stateful PI law under noise: carry planes and states thread identically
    carry0 = (jnp.zeros((B_,)),)

    def pol_pi(obs, t, c):
        i = c[0] + 0.05 * obs[0]
        return (-0.8 * obs[0] - 0.1 * i,), (i,)

    obs_f, acts_f, _, last_f, fc_f = env_fused_closed_loop(
        env, st, pol_pi, T, obs_stride=1, interpret=True,
        return_traj_states=True, policy_carry=carry0,
    )
    obs_s, acts_s, _, last_s, fc_s = tile_policy_scan(
        env, st, T, pol_pi, None, collect_trajectory=True, policy_carry=carry0
    )
    np.testing.assert_allclose(np.asarray(obs_f), np.asarray(obs_s), rtol=0, atol=1e-11)
    np.testing.assert_allclose(np.asarray(fc_f[0]), np.asarray(fc_s[0]), rtol=0, atol=1e-11)


def test_constructor_validation():
    with pytest.raises(ValueError, match="not one of"):
        excenvs.Pendulum(batch_size=4, process_noise={"bogus": 0.1})
    with pytest.raises(ValueError, match="non-negative scalar"):
        excenvs.Pendulum(batch_size=4, process_noise={"omega": -1.0})
    with pytest.raises(ValueError, match="non-negative scalar"):
        excenvs.Pendulum(batch_size=4, observation_noise={"theta": jnp.ones(4)})
    # all-zero sigmas collapse to the exact deterministic path
    env = excenvs.Pendulum(batch_size=4, process_noise={"omega": 0.0})
    assert not env._has_noise


def test_fused_traj_states_carry_advanced_keys():
    """A trajectory state saved at step s must carry the key chain advanced
    through s steps (scan parity) — resuming from it must not replay draws
    the rollout already consumed."""
    from exciting_environments_tpu.ops.pallas.stepper import env_fused_rollout

    B_, T, stride = 1024, 16, 4
    env = excenvs.Pendulum(
        batch_size=B_, tau=TAU, process_noise={"omega": 0.5},
        observation_noise={"theta": 0.05},
    )
    _, st = env.vmap_reset(jax.random.split(jax.random.PRNGKey(2), B_))
    acts = jax.random.uniform(jax.random.PRNGKey(3), (B_, T, 1), minval=-1, maxval=1)
    _, traj, final = env_fused_rollout(
        env, st, acts, obs_stride=stride, interpret=True, strict=True,
        return_traj_states=True,
    )
    for s in range(T // stride):
        _, scan_state = env.vmap_rollout(st, acts[:, : (s + 1) * stride])
        np.testing.assert_array_equal(
            np.asarray(traj.PRNGKey)[:, s], np.asarray(scan_state.PRNGKey)
        )
    np.testing.assert_array_equal(np.asarray(final.PRNGKey), np.asarray(traj.PRNGKey)[:, -1])


def test_fast_mode_key_contracts_and_statistics():
    """Fast mode's documented contracts: the state key after a T-step rollout
    is ``fold_in(key, T)``, trajectory saves carry ``fold_in(key, s)``,
    ``step`` realizes the T=1 rollout, and the increments keep the exact
    mode's N(0, sigma^2 tau) statistics and Brownian accumulation."""
    from exciting_environments_tpu.ops.pallas.stepper import env_fused_rollout

    B_, T, stride = 1024, 16, 4
    env = excenvs.Pendulum(
        batch_size=B_, tau=TAU, process_noise={"omega": 0.5},
        observation_noise={"theta": 0.02}, noise_mode="fast",
    )
    _, st = env.vmap_reset(jax.random.split(jax.random.PRNGKey(5), B_))
    acts = jax.random.uniform(jax.random.PRNGKey(6), (B_, T, 1), minval=-1, maxval=1)

    # key contracts (state keys are the reset's split children, hence st.PRNGKey)
    _, traj, final = env_fused_rollout(
        env, st, acts, obs_stride=stride, interpret=True, strict=True,
        return_traj_states=True,
    )
    expect_saves = jax.vmap(
        lambda k: jax.vmap(lambda t: jax.random.fold_in(k, t))(
            jnp.arange(1, T // stride + 1) * stride
        )
    )(st.PRNGKey)
    np.testing.assert_array_equal(np.asarray(traj.PRNGKey), np.asarray(expect_saves))
    np.testing.assert_array_equal(
        np.asarray(final.PRNGKey), np.asarray(expect_saves)[:, -1]
    )

    # step() == 1-step rollout (draws AND key)
    obs1, st1 = env.vmap_step(st, acts[:, 0])
    obs_r, fin_r = env.vmap_rollout(st, acts[:, :1])
    np.testing.assert_allclose(
        np.asarray(obs1), np.asarray(obs_r[:, 0]), rtol=0, atol=1e-12
    )
    np.testing.assert_array_equal(np.asarray(st1.PRNGKey), np.asarray(fin_r.PRNGKey))

    # statistics: one-step increment std == sigma * sqrt(tau); variance grows
    # along the horizon (Brownian scaling, same loose band as exact mode)
    det = excenvs.Pendulum(batch_size=B_, tau=TAU)
    _, st_d = det.vmap_reset(jax.random.split(jax.random.PRNGKey(5), B_))
    _, sd1 = det.vmap_step(st_d, acts[:, 0])
    d = np.asarray(st1.physical_state.omega) - np.asarray(sd1.physical_state.omega)
    expected = 0.5 * np.sqrt(TAU)
    assert abs(d.std() / expected - 1.0) < 0.1
    _, f32 = env.vmap_rollout(st, jnp.zeros((B_, 32, 1)))
    _, f128 = env.vmap_rollout(st, jnp.zeros((B_, 128, 1)))
    _, d32 = det.vmap_rollout(st_d, jnp.zeros((B_, 32, 1)))
    _, d128 = det.vmap_rollout(st_d, jnp.zeros((B_, 128, 1)))
    v32 = np.var(np.asarray(f32.physical_state.omega) - np.asarray(d32.physical_state.omega))
    v128 = np.var(np.asarray(f128.physical_state.omega) - np.asarray(d128.physical_state.omega))
    assert 2.0 < v128 / v32 < 12.0

    # reproducible per key, and a different stream than exact mode
    _, again = env.vmap_rollout(st, acts)
    _, once = env.vmap_rollout(st, acts)
    np.testing.assert_array_equal(
        np.asarray(again.physical_state.omega), np.asarray(once.physical_state.omega)
    )
    exact = excenvs.Pendulum(
        batch_size=B_, tau=TAU, process_noise={"omega": 0.5},
        observation_noise={"theta": 0.02},
    )
    _, fin_exact = exact.vmap_rollout(st, acts)
    assert not np.array_equal(
        np.asarray(fin_exact.physical_state.omega), np.asarray(once.physical_state.omega)
    )

    with pytest.raises(ValueError, match="noise_mode"):
        excenvs.Pendulum(batch_size=4, noise_mode="bogus")


@pytest.mark.parametrize("saturated", [True, False])
def test_pmsm_stochastic_simulation(saturated):
    """Stochastic drive: current-process disturbance (with the derived torque
    recomputed from the perturbed currents), sensor noise on the measured
    columns only, deterministic paths guarded, kernel scope excluded."""
    variant = excenvs.MotorVariant.BRUSA
    mk = lambda **kw: excenvs.PMSM(
        batch_size=256, saturated=saturated, motor_variant=variant, **kw
    )
    env = mk(
        process_noise={"i_d": 2.0, "i_q": 2.0},
        observation_noise={"i_d": 0.5, "i_q": 0.5, "torque": 0.2},
    )
    det = mk()
    keys = jax.random.split(jax.random.PRNGKey(0), 256)
    _, st = env.vmap_reset(keys)
    _, sd = det.vmap_reset(keys)
    a = 0.1 * jnp.ones((256, 2))
    obs, st1 = env.vmap_step(st, a)
    _, sd1 = det.vmap_step(sd, a)

    # one-step current increment is N(0, sigma^2 tau); buffers/epsilon exact
    d = np.asarray(st1.physical_state.i_d) - np.asarray(sd1.physical_state.i_d)
    expected = 2.0 * np.sqrt(env.tau)
    assert abs(d.std() / expected - 1.0) < 0.2
    np.testing.assert_allclose(
        np.asarray(st1.physical_state.epsilon), np.asarray(sd1.physical_state.epsilon),
        rtol=0, atol=1e-12,
    )

    # the derived torque reflects the PERTURBED currents (LUT or linear)
    to_torque = (
        env.currents_to_torque_saturated if saturated else env.currents_to_torque
    )
    tq = jax.vmap(lambda i_d, i_q: to_torque(i_d, i_q, env.env_properties))(
        st1.physical_state.i_d, st1.physical_state.i_q
    )
    np.testing.assert_allclose(
        np.asarray(tq).ravel(), np.asarray(st1.physical_state.torque).ravel(),
        rtol=1e-12, atol=1e-12,
    )

    # sensor noise hits only the measured columns (i_d, i_q, torque here);
    # omega_el unconfigured, cos/sin encoder and buffers always exact
    clean = jax.vmap(env.generate_observation, in_axes=(0, None))(
        st1, env.env_properties
    )
    dobs = np.asarray(obs - clean)
    assert dobs[:, 0].std() > 0 and dobs[:, 1].std() > 0 and dobs[:, 3].std() > 0
    assert np.abs(dobs[:, [2, 4, 5, 6, 7]]).max() < 1e-12
    # normalized sigma of the i_d column: 2 * sigma / span
    norm = env.env_properties.physical_normalizations.i_d
    expected_col = 2 * 0.5 / float(norm.max - norm.min)
    assert abs(dobs[:, 0].std() / expected_col - 1.0) < 0.2

    # stochastic drives ride the scan: kernel scope excluded, strict raises,
    # transparent fallback matches vmap_rollout draw-for-draw
    assert rollout_path(env) == "scan"
    acts = 0.1 * jnp.ones((256, 8, 2))
    with pytest.raises(ValueError):
        env.fused_rollout(st, acts, strict=True)
    obs_f, fin_f = env.fused_rollout(st, acts, obs_stride=8)
    obs_r, fin_r = env.vmap_rollout(st, acts, obs_stride=8)
    np.testing.assert_array_equal(np.asarray(obs_f), np.asarray(obs_r))
    np.testing.assert_array_equal(
        np.asarray(fin_f.PRNGKey), np.asarray(fin_r.PRNGKey)
    )

    # trajectory paths: stochastic sim_ahead integrates the SDE for the
    # one-stage default (round 5 — draw parity pinned in
    # test_pmsm_stochastic_sim_ahead_matches_step_loop); multistage raises,
    # adaptive stays deterministic-only
    obs_sa, _, _ = env.vmap_sim_ahead(st, jnp.zeros((256, 4, 2)), env.tau, env.tau)
    assert np.isfinite(np.asarray(obs_sa)).all()
    env_ms = mk(process_noise={"i_d": 2.0}, solver="tsit5")
    _, st_ms = env_ms.vmap_reset(keys)
    with pytest.raises(ValueError, match="one-stage"):
        env_ms.vmap_sim_ahead(st_ms, jnp.zeros((256, 4, 2)), env_ms.tau, env_ms.tau)
    with pytest.raises(ValueError, match="adaptive_rollout"):
        adaptive_rollout(env, st, jnp.zeros((256, 4, 2)))

    # validation: only currents take process noise, no epsilon sensor noise
    with pytest.raises(ValueError, match="not one of"):
        mk(process_noise={"epsilon": 0.1})
    with pytest.raises(ValueError, match="not one of"):
        mk(observation_noise={"epsilon": 0.1})


def test_pmsm_fast_mode_step_realizes_one_step_rollout():
    env = excenvs.PMSM(
        batch_size=64, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA,
        process_noise={"i_q": 2.0}, observation_noise={"i_d": 0.5},
        noise_mode="fast",
    )
    _, st = env.vmap_reset(jax.random.split(jax.random.PRNGKey(2), 64))
    a = 0.1 * jnp.ones((64, 2))
    o1, s1 = env.vmap_step(st, a)
    orr, fr = env.vmap_rollout(st, a[:, None, :])
    np.testing.assert_allclose(np.asarray(o1), np.asarray(orr[:, 0]), rtol=0, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(s1.PRNGKey), np.asarray(fr.PRNGKey))
    np.testing.assert_allclose(
        np.asarray(s1.physical_state.i_q), np.asarray(fr.physical_state.i_q),
        rtol=0, atol=1e-12,
    )
    # final-key contract
    exp = jax.vmap(lambda k: jax.random.fold_in(k, 1))(st.PRNGKey)
    np.testing.assert_array_equal(np.asarray(s1.PRNGKey), np.asarray(exp))


def test_typed_prng_keys_accepted():
    """New-style jax.random.key() typed keys drive the noise paths too."""
    env = excenvs.Pendulum(batch_size=8, tau=TAU, process_noise={"omega": 0.5})
    _, st = env.vmap_reset(jax.random.split(jax.random.key(0), 8))
    obs, st1 = env.vmap_step(st, jnp.zeros((8, 1)))
    assert np.isfinite(np.asarray(obs)).all()
    # raw uint32 keys with the same data give the identical draw stream
    raw = excenvs.Pendulum(batch_size=8, tau=TAU, process_noise={"omega": 0.5})
    _, st_raw = raw.vmap_reset(jax.random.split(jax.random.PRNGKey(0), 8))
    _, st1_raw = raw.vmap_step(st_raw, jnp.zeros((8, 1)))
    np.testing.assert_allclose(
        np.asarray(st1.physical_state.omega), np.asarray(st1_raw.physical_state.omega)
    )


@pytest.mark.parametrize("saturated", [False, True])
@pytest.mark.parametrize("noise_mode", ["exact", "fast"])
def test_pmsm_stochastic_sim_ahead_matches_step_loop(saturated, noise_mode):
    """Round-5: the PMSM's overridden ``sim_ahead`` integrates the SDE for
    one-stage solvers like the classic envs — at ``obs_stepsize ==
    action_stepsize`` it consumes the step path's exact per-step key chain
    in both noise modes, the deadtime shift matching step's buffer swap.
    (Trajectory closeness, not bitwise: the documented hardcoded-``tau``
    constraint-angle extrapolation reproduces step's angles to float
    precision here, like the deterministic parity contract.)"""
    B_, T_ = 64, 12
    variant = excenvs.MotorVariant.BRUSA
    env = excenvs.PMSM(
        batch_size=B_, saturated=saturated, motor_variant=variant,
        process_noise={"i_d": 2.0, "i_q": 2.0},
        observation_noise={"i_d": 0.5, "torque": 0.2},
        noise_mode=noise_mode,
    )
    _, st = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B_))
    acts = jax.random.uniform(jax.random.PRNGKey(1), (B_, T_, 2), minval=-0.4, maxval=0.4)

    obs_sa, states, last = env.vmap_sim_ahead(st, acts, env.tau, env.tau)
    assert obs_sa.shape == (B_, T_ + 1, 8)

    s = st
    obs_rows = []
    for t in range(T_):
        o, s = env.vmap_step(s, acts[:, t])
        obs_rows.append(o)
    obs_step = jnp.stack(obs_rows, axis=1)
    np.testing.assert_allclose(
        np.asarray(obs_sa[:, 1:]), np.asarray(obs_step), rtol=1e-8, atol=1e-8
    )
    # the key chain is literally step's chain: final keys equal
    assert jnp.array_equal(jnp.asarray(last.PRNGKey), jnp.asarray(s.PRNGKey))
    # per-save keys advance (resume must not replay consumed draws)
    k = jnp.asarray(states.PRNGKey)
    assert not jnp.array_equal(k[:, 4], k[:, 5])
    # the initial row is the exact reset observation (no draw consumed)
    obs0 = jax.vmap(env.generate_observation, in_axes=(0, env.in_axes_env_properties))(
        st, env.env_properties
    )
    np.testing.assert_allclose(
        np.asarray(obs_sa[:, 0]), np.asarray(obs0), rtol=1e-12, atol=1e-13
    )
    # torque column of the returned states reflects the perturbed currents
    to_torque = (
        env.currents_to_torque_saturated if saturated else env.currents_to_torque
    )
    tq = jax.vmap(jax.vmap(lambda i_d, i_q: to_torque(i_d, i_q, env.env_properties)))(
        states.physical_state.i_d, states.physical_state.i_q
    )
    np.testing.assert_allclose(
        np.asarray(tq), np.asarray(states.physical_state.torque), rtol=1e-10, atol=1e-10
    )
