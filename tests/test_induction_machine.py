"""InductionMachine: physics invariants, engine-feature coverage, and the
rotor-flux observer (the canonical sensorless-drive problem).

The beyond-reference SCIM is the drive-flavored extensibility proof: a
declarative linear-ODE subclass that gets the fused kernel, stochastic
simulation, EKF flux reconstruction, per-batch parameter sweeps and the
registry with zero environment-specific engine code."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.ops.pallas import rollout_path
from exciting_environments_tpu.ops.pallas.stepper import env_fused_rollout
from exciting_environments_tpu.utils import estimate

PARAMS = excenvs.InductionMachine._default_static_params()


def test_registry_and_defaults():
    env = excenvs.EnvironmentRegistry.INDUCTION_MACHINE.make(batch_size=8)
    assert isinstance(env, excenvs.InductionMachine)
    assert list(env.obs_description) == ["i_sd", "i_sq", "psi_rd", "psi_rq"]
    assert float(env.env_properties.static_params.r_s) == 2.9
    obs, state = env.vmap_reset()
    np.testing.assert_allclose(np.asarray(obs), 0.0, atol=1e-12)


def test_dc_magnetization_steady_state():
    """At standstill (omega = 0) under a DC d-axis voltage the machine must
    settle to the textbook operating point: ``i_sd = u / R_s`` (no rotor
    current once the flux is built) and ``psi_rd = L_m i_sd``, with the
    q-axis identically zero."""
    env = excenvs.InductionMachine(
        batch_size=4, static_params={**PARAMS, "omega": 0.0}
    )
    _, s0 = env.vmap_reset()
    u_norm = 0.05
    acts = jnp.concatenate(
        [u_norm * jnp.ones((4, 20_000, 1)), jnp.zeros((4, 20_000, 1))], axis=-1
    )
    _, fin = env.vmap_rollout(s0, acts)
    p = env.env_properties.static_params
    u_phys = u_norm * 325.0
    np.testing.assert_allclose(
        np.asarray(fin.physical_state.i_sd), u_phys / float(p.r_s), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(fin.physical_state.psi_rd),
        float(p.l_m) * np.asarray(fin.physical_state.i_sd),
        rtol=1e-4,
    )
    assert float(jnp.abs(fin.physical_state.psi_rq).max()) < 1e-9
    assert float(jnp.abs(fin.physical_state.i_sq).max()) < 1e-9
    # no flux cross-product -> zero torque at this operating point
    assert float(jnp.abs(env.torque(fin)).max()) < 1e-9


def test_rotating_supply_produces_torque_and_stays_bounded():
    """A synchronous sinusoidal supply at small slip must spin up bounded
    currents/fluxes and a nonzero mean torque of the expected sign."""
    env = excenvs.InductionMachine(batch_size=2)
    _, s0 = env.vmap_reset()
    T = 20_000
    w_s = float(PARAMS["omega"]) / 0.96  # ~4% slip above rotor speed
    t = jnp.arange(T) * env.tau
    acts = 0.4 * jnp.stack(
        [jnp.broadcast_to(jnp.cos(w_s * t), (2, T)), jnp.broadcast_to(jnp.sin(w_s * t), (2, T))],
        axis=-1,
    )
    obs, fin = env.vmap_rollout(s0, acts, obs_stride=100)
    assert np.isfinite(np.asarray(obs)).all()
    assert float(jnp.abs(obs).max()) < 1.0  # inside the normalized band
    tq = float(env.torque(fin).mean())
    assert tq > 0.5  # motoring torque (supply leads the rotor)


def test_fused_kernel_parity_and_scope():
    """The declarative env rides the generic fused Pallas kernel unchanged."""
    B = 1024
    env = excenvs.InductionMachine(batch_size=B)
    assert rollout_path(env) == "fused"
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B))
    acts = jax.random.uniform(jax.random.PRNGKey(1), (B, 16, 2), minval=-0.3, maxval=0.3)
    obs_f, fin_f = env_fused_rollout(env, s0, acts, obs_stride=4, interpret=True, strict=True)
    obs_s, fin_s = env.vmap_rollout(s0, acts, obs_stride=4)
    np.testing.assert_allclose(np.asarray(obs_f), np.asarray(obs_s), rtol=0, atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(fin_f.physical_state.psi_rd), np.asarray(fin_s.physical_state.psi_rd),
        rtol=0, atol=1e-11,
    )


def test_per_batch_rotor_resistance_sweep():
    """Per-batch r_r (the classic temperature-drift parameter) rides the
    heterogeneous-params machinery; hotter rotors (larger r_r) magnetize
    faster (shorter rotor time constant)."""
    B = 8
    r_r = jnp.linspace(1.8, 3.2, B)
    env = excenvs.InductionMachine(
        batch_size=B, static_params={**PARAMS, "r_r": r_r, "omega": 0.0}
    )
    _, s0 = env.vmap_reset()
    acts = jnp.concatenate([0.05 * jnp.ones((B, 2000, 1)), jnp.zeros((B, 2000, 1))], -1)
    _, fin = env.vmap_rollout(s0, acts)
    psi = np.asarray(fin.physical_state.psi_rd)
    assert (np.diff(psi) > 0).all()  # monotone in r_r at this (early) horizon


def test_ekf_reconstructs_rotor_flux_from_noisy_currents():
    """The sensorless-drive capstone: rotor flux is not measurable; the EKF
    rebuilds it from NOISY current sensors alone, to a few percent of band."""
    B, T = 3, 400
    sig = {"i_sd": 0.5, "i_sq": 0.5}
    noisy = excenvs.InductionMachine(batch_size=B, observation_noise=sig)
    clean = excenvs.InductionMachine(batch_size=B)
    keys = jax.random.split(jax.random.PRNGKey(5), B)
    st = noisy.vmap_reset(keys)[1]
    st_c = clean.vmap_reset(keys)[1]
    w_s = float(PARAMS["omega"]) / 0.96
    t = jnp.arange(T) * noisy.tau
    acts = 0.4 * jnp.broadcast_to(
        jnp.stack([jnp.cos(w_s * t), jnp.sin(w_s * t)], axis=-1)[None], (B, T, 2)
    )
    obs_noisy, _ = noisy.vmap_rollout(st, acts)
    obs_true, _ = clean.vmap_rollout(st_c, acts)

    res = estimate.run_ekf(
        noisy, np.asarray(obs_noisy), acts,
        measured_fields=("i_sd", "i_sq"),
        process_std={"psi_rd": 0.02, "psi_rq": 0.02},
    )
    names = tuple(f.name for f in dataclasses.fields(noisy.PhysicalState))
    half = T // 2
    for field in ("psi_rd", "psi_rq"):
        k = names.index(field)
        est = np.asarray(res.means)[:, half:, k]
        true = np.asarray(obs_true)[:, half:, k]  # classic layout: col == field idx
        rmse = float(np.sqrt(np.mean((est - true) ** 2)))
        band = float(np.sqrt(np.mean(true**2)))
        assert rmse < 0.25 * max(band, 0.05), (field, rmse, band)


def test_stochastic_and_deterministic_guards():
    env = excenvs.InductionMachine(
        batch_size=8, process_noise={"i_sd": 0.5}, observation_noise={"psi_rd": 0.01}
    )
    _, st = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), 8))
    obs, st1 = env.vmap_step(st, jnp.zeros((8, 2)))
    assert np.isfinite(np.asarray(obs)).all()
    # round 4: one-stage stochastic sim_ahead integrates the SDE (no raise);
    # multistage solvers keep the documented SDE-semantics raise
    obs_sa, _, _ = env.vmap_sim_ahead(st, jnp.zeros((8, 4, 2)), env.tau, env.tau)
    assert np.isfinite(np.asarray(obs_sa)).all()
    env_ms = excenvs.InductionMachine(
        batch_size=8, process_noise={"i_sd": 0.5}, solver="tsit5"
    )
    _, st_ms = env_ms.vmap_reset(jax.random.split(jax.random.PRNGKey(0), 8))
    with pytest.raises(ValueError, match="one-stage"):
        env_ms.vmap_sim_ahead(st_ms, jnp.zeros((8, 4, 2)), env_ms.tau, env_ms.tau)


def test_u_dc_inverter_realism_consistent_on_every_path():
    """Round 5: ``u_dc=`` enables the SVM linear-modulation limit (the
    hexagon's inscribed circle — rotation-invariant, hence exact without an
    angle state) on the stator voltage pair, applied identically on
    step / sim_ahead / fused open loop / the closed-loop kernel via the
    engine's state-independent action-constraint hook — the EESM recipe,
    now shared by all three drives."""
    from exciting_environments_tpu.ops.pallas.stepper import (
        env_fused_closed_loop,
    )
    from exciting_environments_tpu.utils.collect import tile_policy_scan

    B_, T_ = 1024, 12
    env = excenvs.InductionMachine(batch_size=B_, u_dc=400.0)
    env0 = excenvs.InductionMachine(batch_size=B_)
    _, st = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B_))
    acts = 0.9 * jnp.ones((B_, T_, 2))

    obs_c, last_c = env.vmap_rollout(st, acts, T_)
    _, last_u = env0.vmap_rollout(st, acts, T_)
    # commands at 0.9 of the +-325 V band (|u| ~ 414 V) exceed the 231 V
    # inscribed circle: the constraint binds
    assert (
        float(jnp.max(jnp.abs(last_c.physical_state.i_sd - last_u.physical_state.i_sd)))
        > 1e-3
    )

    s = st
    for t in range(T_):
        _, s = env.vmap_step(s, acts[:, t])
    np.testing.assert_allclose(
        np.asarray(s.physical_state.psi_rd),
        np.asarray(last_c.physical_state.psi_rd),
        rtol=0,
        atol=1e-12,
    )

    _, last_f = env_fused_rollout(env, st, acts, interpret=True, strict=True)
    np.testing.assert_allclose(
        np.asarray(last_f.physical_state.i_sd),
        np.asarray(last_c.physical_state.i_sd),
        rtol=1e-10,
        atol=1e-10,
    )

    _, _, last_sa = env.vmap_sim_ahead(st, acts, env.tau, env.tau)
    np.testing.assert_allclose(
        np.asarray(last_sa.physical_state.i_sd),
        np.asarray(last_c.physical_state.i_sd),
        rtol=1e-10,
        atol=1e-10,
    )

    def policy(obs, t):
        return (0.95 + 0.0 * obs[0], 0.95 + 0.0 * obs[1])

    _, last_k = env_fused_closed_loop(env, st, policy, T_, interpret=True)
    _, last_ks = tile_policy_scan(env, st, T_, policy, None, False)
    np.testing.assert_allclose(
        np.asarray(last_k.physical_state.i_sd),
        np.asarray(last_ks.physical_state.i_sd),
        rtol=1e-10,
        atol=1e-10,
    )
    _, last_k0 = env_fused_closed_loop(env0, st, policy, T_, interpret=True)
    assert (
        float(jnp.max(jnp.abs(last_k.physical_state.i_sd - last_k0.physical_state.i_sd)))
        > 1e-3
    )
