"""EESM: physics invariants and engine-feature coverage.

The beyond-reference wound-rotor synchronous machine (magnet-free traction
drive) completes the drive family triangle: a third excitation mechanism
(actively driven field winding, three action dims) as a declarative
linear-ODE subclass that gets the fused kernel, the stationary Kalman
observer (the model is verified-linear), per-batch parameter sweeps and
the registry with zero environment-specific engine code."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.ops.pallas import rollout_path
from exciting_environments_tpu.ops.pallas.stepper import env_fused_rollout
from exciting_environments_tpu.core.structures import replace
from exciting_environments_tpu.utils import estimate

PARAMS = excenvs.EESM._default_static_params()
ACT_SCALE = np.array([325.0, 325.0, 60.0])


def test_registry_and_defaults():
    env = excenvs.EnvironmentRegistry.EESM.make(batch_size=8)
    assert isinstance(env, excenvs.EESM)
    assert list(env.obs_description) == ["i_d", "i_q", "i_f"]
    assert float(env.env_properties.static_params.r_f) == 2.0
    obs, _ = env.vmap_reset()
    np.testing.assert_allclose(np.asarray(obs), 0.0, atol=1e-12)


def test_standstill_dc_steady_state():
    """At standstill (omega_el = 0) under DC voltages the three windings
    decouple resistively: i = u / R per winding, with the mutual coupling
    only shaping the transient."""
    env = excenvs.EESM(batch_size=4, static_params={**PARAMS, "omega_el": 0.0})
    _, s0 = env.vmap_reset()
    u_norm = np.array([0.02, 0.01, 0.3])
    acts = jnp.broadcast_to(jnp.asarray(u_norm), (4, 30_000, 3))
    _, fin = env.vmap_rollout(s0, acts)
    p = env.env_properties.static_params
    u_phys = u_norm * ACT_SCALE
    np.testing.assert_allclose(
        np.asarray(fin.physical_state.i_d), u_phys[0] / float(p.r_s), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(fin.physical_state.i_q), u_phys[1] / float(p.r_s), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(fin.physical_state.i_f), u_phys[2] / float(p.r_f), rtol=1e-4
    )


def test_matches_exact_linear_solution():
    """Frozen omega_el makes the EESM an LTI system; the RK4 rollout must
    match the matrix-exponential closed form x(t) = x_ss + e^{At}(x0-x_ss)
    built independently from the same parameters."""
    env = excenvs.EESM(batch_size=2, tau=5e-5, solver="rk4")
    p = {k: float(v) for k, v in PARAMS.items()}
    det = p["l_d"] * p["l_f"] - p["l_m"] ** 2
    w = p["omega_el"]
    # d(psi)/dt rows in current coordinates, then currents = Linv @ psi rows
    a_psi = np.array(
        [
            [-p["r_s"], w * p["l_q"], 0.0],
            [-w * p["l_d"], -p["r_s"], -w * p["l_m"]],
            [0.0, 0.0, -p["r_f"]],
        ]
    )
    l_inv = np.array(
        [
            [p["l_f"] / det, 0.0, -p["l_m"] / det],
            [0.0, 1.0 / p["l_q"], 0.0],
            [-p["l_m"] / det, 0.0, p["l_d"] / det],
        ]
    )
    a = l_inv @ a_psi
    b = l_inv
    u_norm = np.array([0.05, -0.03, 0.2])
    u_phys = u_norm * ACT_SCALE
    T = 2_000
    t_end = T * env.tau
    x_ss = -np.linalg.solve(a, b @ u_phys)
    import scipy.linalg as sla  # only in the test: independent ground truth

    x_exact = x_ss + sla.expm(a * t_end) @ (-x_ss)  # x0 = 0
    _, s0 = env.vmap_reset()
    acts = jnp.broadcast_to(jnp.asarray(u_norm), (2, T, 3))
    _, fin = env.vmap_rollout(s0, acts)
    got = np.stack(
        [
            np.asarray(fin.physical_state.i_d),
            np.asarray(fin.physical_state.i_q),
            np.asarray(fin.physical_state.i_f),
        ],
        axis=-1,
    )
    np.testing.assert_allclose(got, np.broadcast_to(x_exact, (2, 3)), rtol=2e-5, atol=2e-5)


def test_field_step_induces_d_axis_transient():
    """Transformer coupling: at standstill with the stator shorted, a field
    voltage step must induce a NEGATIVE d-current transient (opposing the
    rising field flux) that dies back to zero at steady state."""
    env = excenvs.EESM(batch_size=1, static_params={**PARAMS, "omega_el": 0.0})
    _, s0 = env.vmap_reset()
    T = 30_000
    acts = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.3]), (1, T, 3))
    obs, fin = env.vmap_rollout(s0, acts, obs_stride=10)
    i_d_traj = np.asarray(obs[0, :, 0]) * 20.0  # denormalize
    assert i_d_traj.min() < -0.05  # induced opposing current
    np.testing.assert_allclose(np.asarray(fin.physical_state.i_d), 0.0, atol=2e-3)


def test_torque_components():
    """Torque = excitation + reluctance: check both terms via the flux form
    1.5 p (psi_d i_q - psi_q i_d) at a hand-set state."""
    env = excenvs.EESM(batch_size=1)
    p = env.env_properties.static_params
    _, st = env.vmap_reset()
    phys = replace(
        st.physical_state,
        i_d=jnp.array([2.0]), i_q=jnp.array([3.0]), i_f=jnp.array([5.0]),
    )
    st = replace(st, physical_state=phys)
    psi_d = float(p.l_d) * 2.0 + float(p.l_m) * 5.0
    psi_q = float(p.l_q) * 3.0
    want = 1.5 * float(p.p) * (psi_d * 3.0 - psi_q * 2.0)
    np.testing.assert_allclose(np.asarray(env.torque(st)), want, rtol=1e-6)
    # reluctance-only: no field current, l_d != l_q still produces torque
    phys0 = replace(phys, i_f=jnp.array([0.0]))
    tq0 = float(env.torque(replace(st, physical_state=phys0))[0])
    np.testing.assert_allclose(
        tq0, 1.5 * float(p.p) * (float(p.l_d) - float(p.l_q)) * 2.0 * 3.0, rtol=1e-6
    )


def test_fused_kernel_parity_and_scope():
    """The declarative env rides the generic fused Pallas kernel unchanged."""
    B = 1024
    env = excenvs.EESM(batch_size=B)
    assert rollout_path(env) == "fused"
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B))
    acts = jax.random.uniform(jax.random.PRNGKey(1), (B, 16, 3), minval=-0.3, maxval=0.3)
    obs_f, fin_f = env_fused_rollout(env, s0, acts, obs_stride=4, interpret=True, strict=True)
    obs_s, fin_s = env.vmap_rollout(s0, acts, obs_stride=4)
    np.testing.assert_allclose(np.asarray(obs_f), np.asarray(obs_s), rtol=0, atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(fin_f.physical_state.i_f), np.asarray(fin_s.physical_state.i_f),
        rtol=0, atol=1e-11,
    )


def test_stationary_kalman_accepts_the_linear_model():
    """The EESM is verified-linear: the stationary gain extracts, and its
    one-gain filter reconstructs the unmeasured FIELD current from noisy
    stator currents (the magnet-free drive's observer problem)."""
    B, T = 2, 600
    sig = {"i_d": 0.3, "i_q": 0.3}
    noisy = excenvs.EESM(batch_size=B, observation_noise=sig)
    clean = excenvs.EESM(batch_size=B)
    keys = jax.random.split(jax.random.PRNGKey(7), B)
    st = noisy.vmap_reset(keys)[1]
    st_c = clean.vmap_reset(keys)[1]
    acts = jnp.broadcast_to(jnp.asarray([0.05, -0.03, 0.25]), (B, T, 3))
    obs_noisy, _ = noisy.vmap_rollout(st, acts)
    obs_true, _ = clean.vmap_rollout(st_c, acts)

    sk = estimate.stationary_kalman_gain(
        noisy, measured_fields=("i_d", "i_q"), process_std={"i_f": 0.01}
    )
    # run the constant-gain filter by hand in normalized coordinates:
    # predict x' = A x + B u + c, correct x += K (z - x[midx])
    a, bmat, c, k = np.asarray(sk.A), np.asarray(sk.B), np.asarray(sk.c), np.asarray(sk.K)
    midx, zidx = np.asarray(sk.midx), np.asarray(sk.zidx)
    i_f_idx = sk.names.index("i_f")
    x = np.zeros((B, len(sk.names)))
    errs = []
    for t in range(T):
        x = x @ a.T + np.asarray(acts[:, t]) @ bmat.T + c[None, :]
        innov = np.asarray(obs_noisy[:, t])[:, zidx] - x[:, midx]
        x = x + innov @ k.T
        if t >= T // 2:
            errs.append(x[:, i_f_idx] - np.asarray(obs_true[:, t, i_f_idx]))
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    raw_band = 0.3 / 20.0  # sensor sigma in normalized units
    assert rmse < raw_band, rmse  # reconstructs i_f below the sensor noise floor


def test_per_batch_saliency_sweep():
    """Per-batch l_q rides the heterogeneous-params machinery: reluctance
    torque scales with (l_d - l_q) at a fixed current point."""
    B = 8
    l_q = jnp.linspace(3.0e-3, 6.0e-3, B)
    env = excenvs.EESM(batch_size=B, static_params={**PARAMS, "l_q": l_q})
    _, st = env.vmap_reset()
    phys = replace(
        st.physical_state,
        i_d=jnp.full((B,), 2.0), i_q=jnp.full((B,), 3.0), i_f=jnp.zeros((B,)),
    )
    tq = np.asarray(env.torque(replace(st, physical_state=phys)))
    assert (np.diff(tq) < 0).all()  # larger l_q -> less (more negative) torque
    # and the dynamics accept the per-batch leaf end-to-end
    acts = jnp.zeros((B, 50, 3))
    obs, _ = env.vmap_rollout(st, acts)
    assert np.isfinite(np.asarray(obs)).all()


def test_eesm_current_tile_kernel_parity():
    """make_eesm_current_tile runs inside the fused closed-loop kernel: the
    kernel run equals the tile-policy scan at machine precision (states,
    actions, all three integrator planes)."""
    from exciting_environments_tpu.core import structures
    from exciting_environments_tpu.ops.pallas.stepper import env_fused_closed_loop
    from exciting_environments_tpu.utils import foc
    from exciting_environments_tpu.utils.collect import tile_policy_scan

    B = 1024  # kernel tiling requires a multiple of 1024
    env = excenvs.EESM(batch_size=B)
    tile, carry0 = foc.make_eesm_current_tile(
        env, i_d_ref=2.0, i_q_ref=5.0, i_f_ref=4.0
    )
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(3), B))
    T = 16
    obs_f, acts_f, last_f, fc = env_fused_closed_loop(
        env, s0, tile, T, obs_stride=1, interpret=True, policy_carry=carry0
    )
    obs_s, acts_s, _, last_s, fc_s = tile_policy_scan(
        env, s0, T, tile, None, collect_trajectory=True, policy_carry=carry0
    )
    np.testing.assert_allclose(np.asarray(obs_f), np.asarray(obs_s), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(acts_f), np.asarray(acts_s), rtol=1e-10, atol=1e-12)
    for j in range(3):
        np.testing.assert_allclose(
            np.asarray(fc[j]), np.asarray(fc_s[j]), rtol=1e-10, atol=1e-12
        )


def test_eesm_current_tile_settles_on_setpoints():
    """The PI law drives all three currents onto their setpoints through
    the d/field transformer coupling, with every commanded voltage inside
    the normalized band."""
    from exciting_environments_tpu.utils import foc
    from exciting_environments_tpu.utils.collect import tile_policy_scan

    B = 8
    refs = dict(i_d_ref=2.0, i_q_ref=5.0, i_f_ref=4.0)
    env = excenvs.EESM(batch_size=B)
    tile, carry0 = foc.make_eesm_current_tile(env, **refs)
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(4), B))
    obs_t, acts_t, _, last, _ = jax.jit(
        lambda st: tile_policy_scan(
            env, st, 6000, tile, None, collect_trajectory=True, policy_carry=carry0
        )
    )(s0)
    phys = last.physical_state
    np.testing.assert_allclose(np.asarray(phys.i_d), refs["i_d_ref"], rtol=2e-2)
    np.testing.assert_allclose(np.asarray(phys.i_q), refs["i_q_ref"], rtol=2e-2)
    np.testing.assert_allclose(np.asarray(phys.i_f), refs["i_f_ref"], rtol=2e-2)
    acts = np.asarray(acts_t)
    assert np.isfinite(acts).all() and (np.abs(acts) <= 1.0 + 1e-9).all()
    # nonzero torque at the setpoint (excitation + reluctance)
    assert float(env.torque(last).min()) > 1.0


def test_u_dc_inverter_realism_consistent_on_every_path():
    """Round-4 stretch: ``u_dc=`` enables the SVM linear-modulation limit
    (the hexagon's inscribed circle — rotation-invariant, hence exact
    without an angle state) on the stator pair, applied identically on
    step / sim_ahead / fused open loop / the closed-loop kernel via the
    engine's state-independent action-constraint hook."""
    from exciting_environments_tpu.ops.pallas.stepper import (
        env_fused_closed_loop,
        env_fused_rollout,
    )
    from exciting_environments_tpu.utils.collect import tile_policy_scan

    B_, T_ = 1024, 12
    env = excenvs.EESM(batch_size=B_, u_dc=400.0)
    env0 = excenvs.EESM(batch_size=B_)
    _, st = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B_))
    acts = jnp.concatenate(
        [0.9 * jnp.ones((B_, T_, 2)), 0.2 * jnp.ones((B_, T_, 1))], axis=-1
    )

    obs_c, last_c = env.vmap_rollout(st, acts, T_)
    _, last_u = env0.vmap_rollout(st, acts, T_)
    # commands at 0.9 of the +-325 V band exceed the 231 V circle: binds
    assert float(jnp.max(jnp.abs(last_c.physical_state.i_d - last_u.physical_state.i_d))) > 1e-3

    s = st
    for t in range(T_):
        _, s = env.vmap_step(s, acts[:, t])
    np.testing.assert_allclose(
        np.asarray(s.physical_state.i_f), np.asarray(last_c.physical_state.i_f),
        rtol=0, atol=1e-12,
    )

    _, last_f = env_fused_rollout(env, st, acts, interpret=True, strict=True)
    np.testing.assert_allclose(
        np.asarray(last_f.physical_state.i_d), np.asarray(last_c.physical_state.i_d),
        rtol=1e-10, atol=1e-10,
    )

    _, _, last_sa = env.vmap_sim_ahead(st, acts, env.tau, env.tau)
    np.testing.assert_allclose(
        np.asarray(last_sa.physical_state.i_d), np.asarray(last_c.physical_state.i_d),
        rtol=1e-10, atol=1e-10,
    )

    def policy(obs, t):
        return (0.95 + 0.0 * obs[0], 0.95 + 0.0 * obs[1], 0.1 + 0.0 * obs[2])

    _, last_k = env_fused_closed_loop(env, st, policy, T_, interpret=True)
    _, last_ks = tile_policy_scan(env, st, T_, policy, None, False)
    np.testing.assert_allclose(
        np.asarray(last_k.physical_state.i_d), np.asarray(last_ks.physical_state.i_d),
        rtol=1e-10, atol=1e-10,
    )
    _, last_k0 = env_fused_closed_loop(env0, st, policy, T_, interpret=True)
    assert float(jnp.max(jnp.abs(last_k.physical_state.i_d - last_k0.physical_state.i_d))) > 1e-3
