"""Sensorless field-oriented control (utils/foc.py) and the generic
output-feedback controller runner (utils/ofc.py::run_output_feedback_controller).

The flagship scenario: an InductionMachine fleet with noisy current sensors,
a 4-state EKF reconstructing the unmeasurable rotor flux, and the
flux-oriented PI law driving flux and torque to their setpoints — the
controller never sees the true plant state.  No reference counterpart
(the reference ships neither the machine, nor observers, nor controllers).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.core import structures
from exciting_environments_tpu.utils import foc, ofc
from exciting_environments_tpu.utils.episodes import reset_with_references

B = 8
# feasible operating point at the default 301.6 rad/s electrical speed:
# back-EMF omega*k_r*psi ~ 201 V leaves ample margin in the 325 V circle
# (commanding psi near the band edge parks the drive ON the voltage limit —
# that regime needs field weakening, out of the law's scope; see foc.py)
PSI_REF = 0.7
TORQUE_REF = 8.0
N_STEPS = 4000  # 0.4 s at tau=1e-4 ~ 3.9 rotor time constants


@pytest.fixture(scope="module")
def foc_run():
    plant = excenvs.InductionMachine(
        batch_size=B, observation_noise={"i_sd": 0.3, "i_sq": 0.3}
    )
    model = excenvs.InductionMachine(batch_size=B)
    _, state = plant.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B))
    # canonical drive startup: machine at rest, zero flux (keys stay usable)
    with structures.copy_and_mutate(state, validate=False) as state:
        state.physical_state.i_sd = jnp.zeros(B)
        state.physical_state.i_sq = jnp.zeros(B)
        state.physical_state.psi_rd = jnp.zeros(B)
        state.physical_state.psi_rq = jnp.zeros(B)
    controller, carry0 = foc.make_sensorless_foc(
        model, psi_ref=PSI_REF, torque_ref=TORQUE_REF
    )
    res = ofc.run_output_feedback_controller(
        plant, model, state, N_STEPS, controller,
        controller_carry=carry0,
        measured_fields=("i_sd", "i_sq"),
        process_std={"psi_rd": 0.02, "psi_rq": 0.02},
        x0=jnp.zeros((4,)),
    )
    return plant, model, res


def test_foc_shapes_and_feasibility(foc_run):
    plant, model, res = foc_run
    assert res.observations.shape == (B, N_STEPS, 4)
    assert res.actions.shape == (B, N_STEPS, 2)
    assert res.belief_means.shape == (B, N_STEPS, 4)
    for leaf in [res.observations, res.actions, res.belief_means, res.nll]:
        assert np.isfinite(np.asarray(leaf)).all()
    assert bool((jnp.abs(res.actions) <= 1.0).all())
    # final controller carry (PI integrators + anti-windup flag) in .plan
    int_d, int_q, int_psi, free = res.plan
    assert int_d.shape == (B,) and np.isfinite(np.asarray(int_d)).all()
    # settled drive: the voltage vector is inside the limit circle
    assert bool(free.all())


def test_foc_reaches_flux_and_torque_setpoints(foc_run):
    plant, model, res = foc_run
    phys = res.final_state.physical_state  # TRUE plant state (never seen)
    psi = np.asarray(jnp.sqrt(phys.psi_rd**2 + phys.psi_rq**2))
    torque = np.asarray(model.torque(res.final_state))
    # flux: first-order buildup with tau_r ~ 103 ms reaches ~98% by 0.4 s
    np.testing.assert_allclose(psi, PSI_REF, rtol=0.06)
    # torque: i_q* adapts to the ESTIMATED flux, so torque holds the setpoint
    np.testing.assert_allclose(torque, TORQUE_REF, rtol=0.10)


def test_foc_orients_on_estimated_flux(foc_run):
    plant, model, res = foc_run
    # the belief flux must itself have converged (the law is only as good as
    # the observer): estimated vs true flux magnitude at the final step
    psi_hat_n = np.asarray(
        jnp.sqrt(res.belief_means[:, -1, 2] ** 2 + res.belief_means[:, -1, 3] ** 2)
    )
    span = 1.5  # psi normalization half-band
    psi_true = np.asarray(
        jnp.sqrt(
            res.final_state.physical_state.psi_rd**2
            + res.final_state.physical_state.psi_rq**2
        )
    )
    np.testing.assert_allclose(psi_hat_n * span, psi_true, rtol=0.08)


def test_foc_voltage_vector_limit():
    """The commanded voltage VECTOR never exceeds the inverter limit, even
    for adversarial (random, far-from-setpoint) belief states."""
    model = excenvs.InductionMachine(batch_size=64)
    controller, carry0 = foc.make_sensorless_foc(
        model, psi_ref=PSI_REF, torque_ref=500.0, i_max=6.0
    )
    # vmap_reset with keys draws random currents/fluxes across the band
    _, state = model.vmap_reset(jax.random.split(jax.random.PRNGKey(1), 64))
    action, carry = controller(state, carry0, 0)
    assert np.isfinite(np.asarray(action)).all()
    u_mag = np.asarray(jnp.hypot(action[:, 0], action[:, 1])) * 325.0
    assert (u_mag <= 325.0 + 1e-6).all()
    # anti-windup: saturated instances have their flag cleared
    assert carry[3].shape == (64,)


def test_foc_field_weakening_high_speed():
    """Above base speed the 1/omega feedforward derates the flux setpoint so
    the drive keeps regulating inside the voltage circle; without it the
    same machine parks on the voltage limit and never reaches the flux."""
    omega_hi = 2 * np.pi * 100  # full-flux back-EMF 419 V >> 325 V limit
    sp = excenvs.InductionMachine._default_static_params()
    sp["omega"] = omega_hi
    # heun: explicit Euler's flux mode is numerically unstable beyond
    # |1 + h(-1/tau_r + j omega)| = 1 <=> omega ~ 441 rad/s at tau=1e-4
    # (the model docstring's +-450 rad/s band) — the plant itself, not the
    # controller, diverges there
    plant = excenvs.InductionMachine(
        batch_size=4, static_params=dict(sp), solver="heun",
        observation_noise={"i_sd": 0.3, "i_sq": 0.3},
    )
    model = excenvs.InductionMachine(batch_size=4, static_params=dict(sp), solver="heun")
    _, state = plant.vmap_reset(jax.random.split(jax.random.PRNGKey(7), 4))
    with structures.copy_and_mutate(state, validate=False) as state:
        state.physical_state.i_sd = jnp.zeros(4)
        state.physical_state.i_sq = jnp.zeros(4)
        state.physical_state.psi_rd = jnp.zeros(4)
        state.physical_state.psi_rq = jnp.zeros(4)
    kw = dict(
        measured_fields=("i_sd", "i_sq"),
        process_std={"psi_rd": 0.02, "psi_rq": 0.02}, x0=jnp.zeros((4,)),
    )

    u_margin = 0.8
    controller, carry0 = foc.make_sensorless_foc(
        model, psi_ref=PSI_REF, torque_ref=1.5,
        field_weakening=True, u_margin=u_margin,
    )
    res = ofc.run_output_feedback_controller(
        plant, model, state, 4000, controller, controller_carry=carry0, **kw
    )
    k_r = sp["l_m"] / sp["l_r"]
    psi_star = u_margin * 325.0 / (omega_hi * k_r)  # 0.434 Vs < psi_ref 0.7
    phys = res.final_state.physical_state
    psi = np.asarray(jnp.sqrt(phys.psi_rd**2 + phys.psi_rq**2))
    np.testing.assert_allclose(psi, psi_star, rtol=0.08)
    np.testing.assert_allclose(
        np.asarray(model.torque(res.final_state)), 1.5, rtol=0.15
    )
    assert bool(res.plan[3].all())  # settled inside the voltage circle

    # contrast: the unweakened law on the same machine rails the inverter
    # and the flux never gets near the (infeasible) setpoint
    controller_n, carry_n = foc.make_sensorless_foc(
        model, psi_ref=PSI_REF, torque_ref=1.5
    )
    res_n = ofc.run_output_feedback_controller(
        plant, model, state, 2500, controller_n, controller_carry=carry_n, **kw
    )
    phys_n = res_n.final_state.physical_state
    psi_n = np.asarray(jnp.sqrt(phys_n.psi_rd**2 + phys_n.psi_rq**2))
    assert (psi_n < 0.6).all()  # voltage-limited: cannot build 0.7 Vs
    assert not bool(res_n.plan[3].all())  # parked on the limit circle


def test_foc_tile_runs_in_kernel():
    """make_foc_tile packages the SAME law as a stateful tile policy: the
    fused closed-loop kernel run equals the tile-policy scan at machine
    precision (states, actions, all four carry planes), and the law on the
    true state drives flux/torque to their setpoints."""
    from exciting_environments_tpu.ops.pallas.stepper import env_fused_closed_loop
    from exciting_environments_tpu.utils.collect import tile_policy_scan

    B_k = 1024  # kernel tiling requires a multiple of 1024
    env = excenvs.InductionMachine(batch_size=B_k)
    policy_tile, carry0 = foc.make_foc_tile(env, psi_ref=PSI_REF, torque_ref=TORQUE_REF)
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(9), B_k))
    with structures.copy_and_mutate(s0, validate=False) as s0:
        s0.physical_state.i_sd = jnp.zeros(B_k)
        s0.physical_state.i_sq = jnp.zeros(B_k)
        s0.physical_state.psi_rd = jnp.zeros(B_k)
        s0.physical_state.psi_rq = jnp.zeros(B_k)

    T = 16
    obs_f, acts_f, last_f, fc = env_fused_closed_loop(
        env, s0, policy_tile, T, obs_stride=1, interpret=True, policy_carry=carry0
    )
    obs_s, acts_s, _, last_s, fc_s = tile_policy_scan(
        env, s0, T, policy_tile, None, collect_trajectory=True, policy_carry=carry0
    )
    np.testing.assert_allclose(np.asarray(obs_f), np.asarray(obs_s), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(acts_f), np.asarray(acts_s), rtol=1e-10, atol=1e-12)
    for j in range(4):
        np.testing.assert_allclose(
            np.asarray(fc[j]), np.asarray(fc_s[j]), rtol=1e-10, atol=1e-12
        )

    # control quality on the true state (fast jitted scan, small fleet):
    # the full-state law reaches the same setpoints the sensorless one does
    env8 = excenvs.InductionMachine(batch_size=8)
    tile8, carry8 = foc.make_foc_tile(env8, psi_ref=PSI_REF, torque_ref=TORQUE_REF)
    _, s8 = env8.vmap_reset(jax.random.split(jax.random.PRNGKey(10), 8))
    with structures.copy_and_mutate(s8, validate=False) as s8:
        s8.physical_state.i_sd = jnp.zeros(8)
        s8.physical_state.i_sq = jnp.zeros(8)
        s8.physical_state.psi_rd = jnp.zeros(8)
        s8.physical_state.psi_rq = jnp.zeros(8)
    _, last8, _ = jax.jit(
        lambda st: tile_policy_scan(
            env8, st, N_STEPS, tile8, None, collect_trajectory=False,
            policy_carry=carry8,
        )
    )(s8)
    phys = last8.physical_state
    psi = np.asarray(jnp.hypot(phys.psi_rd, phys.psi_rq))
    np.testing.assert_allclose(psi, PSI_REF, rtol=0.05)
    np.testing.assert_allclose(
        np.asarray(env8.torque(last8)), TORQUE_REF, rtol=0.05
    )


@pytest.mark.slow
def test_sensorless_foc_tile_in_kernel():
    """TRUE sensorless FOC fully inside the closed-loop kernel: the
    stationary-Kalman observer tile reconstructs the rotor flux from the
    NOISY current observation columns the stochastic kernel streams, and
    the flux-oriented law drives the fleet onto its setpoints — the policy
    never touches the flux columns."""
    from exciting_environments_tpu.ops.pallas.stepper import env_fused_closed_loop
    from exciting_environments_tpu.utils.collect import tile_policy_scan

    B_k = 1024
    plant = excenvs.InductionMachine(
        batch_size=B_k, observation_noise={"i_sd": 0.3, "i_sq": 0.3}
    )
    tile, carry0 = foc.make_sensorless_foc_tile(
        plant, psi_ref=PSI_REF, torque_ref=TORQUE_REF
    )

    # structural sensorlessness: NaN in the flux observation columns never
    # reaches the action (the tile indexes only the measured current cols)
    cols = tuple(
        jnp.full((B_k,), jnp.nan) if i in (2, 3) else jnp.zeros((B_k,))
        for i in range(4)
    )
    acts, _ = tile(cols, 0, carry0)
    assert all(bool(jnp.isfinite(a).all()) for a in acts)

    _, s0 = plant.vmap_reset(jax.random.split(jax.random.PRNGKey(3), B_k))
    with structures.copy_and_mutate(s0, validate=False) as s0:
        s0.physical_state.i_sd = jnp.zeros(B_k)
        s0.physical_state.i_sq = jnp.zeros(B_k)
        s0.physical_state.psi_rd = jnp.zeros(B_k)
        s0.physical_state.psi_rq = jnp.zeros(B_k)

    # kernel == scan on the stochastic plant (draw-identical slabs)
    T = 16
    obs_f, acts_f, last_f, fc = env_fused_closed_loop(
        plant, s0, tile, T, obs_stride=1, interpret=True, policy_carry=carry0
    )
    obs_s, acts_s, _, last_s, fc_s = tile_policy_scan(
        plant, s0, T, tile, None, collect_trajectory=True, policy_carry=carry0
    )
    np.testing.assert_allclose(np.asarray(obs_f), np.asarray(obs_s), rtol=1e-10, atol=1e-11)
    np.testing.assert_allclose(np.asarray(acts_f), np.asarray(acts_s), rtol=1e-10, atol=1e-11)
    for j in range(len(fc)):
        np.testing.assert_allclose(
            np.asarray(fc[j]), np.asarray(fc_s[j]), rtol=1e-10, atol=1e-11
        )

    # long-horizon control quality under sensor noise (fast jitted scan,
    # small fleet): flux and torque settle on the setpoints the drive never
    # directly measures
    B_s = 64
    plant_s = excenvs.InductionMachine(
        batch_size=B_s, observation_noise={"i_sd": 0.3, "i_sq": 0.3}
    )
    tile_s, carry_s = foc.make_sensorless_foc_tile(
        plant_s, psi_ref=PSI_REF, torque_ref=TORQUE_REF
    )
    _, ss = plant_s.vmap_reset(jax.random.split(jax.random.PRNGKey(4), B_s))
    with structures.copy_and_mutate(ss, validate=False) as ss:
        ss.physical_state.i_sd = jnp.zeros(B_s)
        ss.physical_state.i_sq = jnp.zeros(B_s)
        ss.physical_state.psi_rd = jnp.zeros(B_s)
        ss.physical_state.psi_rq = jnp.zeros(B_s)
    _, last, fcl = jax.jit(
        lambda st: tile_policy_scan(
            plant_s, st, 3 * N_STEPS, tile_s, None, collect_trajectory=False,
            policy_carry=carry_s,
        )
    )(ss)
    phys = last.physical_state
    psi = np.asarray(jnp.hypot(phys.psi_rd, phys.psi_rq))
    np.testing.assert_allclose(psi, PSI_REF, rtol=0.03)
    np.testing.assert_allclose(np.asarray(plant_s.torque(last)), TORQUE_REF, rtol=0.05)
    # the observer's corrected flux belief matches the true flux closely
    psi_hat = np.asarray(jnp.hypot(fcl[2] * 1.5, fcl[3] * 1.5))
    np.testing.assert_allclose(psi_hat, psi, rtol=0.05)


def test_foc_rejects_asymmetric_action_band():
    """An asymmetric action band breaks the vector-limit direction guarantee
    (denormalization is no longer linear through zero) — reject loudly
    instead of silently applying a DC offset voltage."""
    from exciting_environments_tpu.utils import MinMaxNormalization

    model = excenvs.InductionMachine(
        batch_size=2,
        action_normalizations={
            "u_sd": MinMaxNormalization(min=-300.0, max=350.0),
            "u_sq": MinMaxNormalization(min=-325.0, max=325.0),
        },
    )
    with pytest.raises(ValueError, match="symmetric"):
        foc.make_sensorless_foc(model, psi_ref=0.5, torque_ref=1.0)


def test_foc_per_batch_bands():
    """Heterogeneous per-batch voltage/current bands construct and broadcast
    (the docstring's promise): each instance's commanded vector respects its
    OWN inverter limit."""
    from exciting_environments_tpu.utils import MinMaxNormalization

    u_max = jnp.array([250.0, 325.0, 400.0, 325.0])
    i_band = jnp.array([10.0, 20.0, 20.0, 5.0])
    model = excenvs.InductionMachine(
        batch_size=4,
        action_normalizations={
            "u_sd": MinMaxNormalization(min=-u_max, max=u_max),
            "u_sq": MinMaxNormalization(min=-u_max, max=u_max),
        },
        physical_normalizations={
            "i_sd": MinMaxNormalization(min=-i_band, max=i_band),
            "i_sq": MinMaxNormalization(min=-i_band, max=i_band),
            "psi_rd": MinMaxNormalization(min=-1.5, max=1.5),
            "psi_rq": MinMaxNormalization(min=-1.5, max=1.5),
        },
    )
    controller, carry0 = foc.make_sensorless_foc(
        model, psi_ref=PSI_REF, torque_ref=500.0
    )
    _, state = model.vmap_reset(jax.random.split(jax.random.PRNGKey(2), 4))
    action, carry = controller(state, carry0, 0)
    assert action.shape == (4, 2)
    assert np.isfinite(np.asarray(action)).all()
    # the normalized action is the voltage divided by the PER-INSTANCE band,
    # so in-band means |a| <= 1 for every instance
    assert bool((jnp.abs(action) <= 1.0 + 1e-6).all())


def test_foc_flux_integrator_antiwindup():
    """An infeasible flux setpoint under i_max must not wind int_psi up
    without bound: the achieved-current back-calculation converges the
    integrator to the bounded fixed point whose command sits on the clip
    (pure error integration would add ~6.0 per 1000 steps here)."""
    model = excenvs.InductionMachine(batch_size=2)
    # i_d demand psi_ref/L_m ~ 3.1 A > i_max=2 A: permanently clipped
    controller, carry = foc.make_sensorless_foc(
        model, psi_ref=0.7, torque_ref=0.0, i_max=2.0
    )
    _, state = model.vmap_reset(jax.random.split(jax.random.PRNGKey(5), 2))
    with structures.copy_and_mutate(state, validate=False) as state:
        state.physical_state.i_sd = jnp.full((2,), 1.9)
        state.physical_state.i_sq = jnp.zeros(2)
        state.physical_state.psi_rd = jnp.full((2,), 0.4)  # below setpoint
        state.physical_state.psi_rq = jnp.zeros(2)

    @jax.jit
    def run(carry, k0, n):
        def body(k, c):
            _, c = controller(state, c, k0 + k)
            return c

        return jax.lax.fori_loop(0, n, body, carry)

    carry_1200 = run(carry, 0, 1200)
    carry_2200 = run(carry_1200, 1200, 1000)
    # converging to a bounded fixed point, not growing: 1000 further steps
    # move int_psi by <0.2 (pure error integration would add 6.0) and the
    # commanded current still sits on the clip
    assert np.abs(np.asarray(carry_2200[2]) - np.asarray(carry_1200[2])).max() < 0.2
    assert np.abs(np.asarray(carry_2200[2])).max() < 2.0


def test_generic_controller_runner_on_pendulum():
    """run_output_feedback_controller is env-generic: a PD law from the
    belief tracks the pendulum reference through noisy angle measurements."""
    tau = 2e-2
    plant = excenvs.Pendulum(
        batch_size=4, tau=tau, control_state=["theta"],
        observation_noise={"theta": 0.05},
    )
    model = excenvs.Pendulum(batch_size=4, tau=tau, control_state=["theta"])
    _, state = jax.jit(lambda k: reset_with_references(plant, k))(jax.random.PRNGKey(4))
    with structures.copy_and_mutate(state, validate=False) as state:
        state.physical_state.theta = jnp.zeros(4)
        state.physical_state.omega = jnp.zeros(4)
        state.reference.theta = jnp.linspace(-0.9, 0.9, 4)

    p = model.env_properties.static_params

    def pd(belief, carry, k):
        # gravity feedforward from the BELIEF (the model's own params) plus
        # a damped P loop — plain P without the feedforward cannot hold a
        # reference against ~15 Nm of gravity torque inside the 20 Nm band
        phys = belief.physical_state
        u_ff = -p.l * p.m * p.g * jnp.sin(phys.theta)
        u = u_ff - 8.0 * (phys.theta - belief.reference.theta) - 2.0 * phys.omega
        return (u / 20.0)[:, None], carry + 1

    res = ofc.run_output_feedback_controller(
        plant, model, state, 60, pd, controller_carry=jnp.int32(0),
        measured_fields=("theta",), process_std={"omega": 0.05},
        x0=jnp.zeros((2,)),
    )
    assert int(res.plan) == 60  # carry threaded through every step
    # second half holds near the reference despite noisy partial measurements
    assert float(res.rewards[:, 30:].mean()) > -0.2
    theta_err = np.asarray(
        res.final_state.physical_state.theta
    ) - np.linspace(-0.9, 0.9, 4)
    assert np.abs(theta_err).max() < 0.25


def test_controller_runner_no_trajectories():
    """return_trajectories=False drops the per-step histories (fleet-scale
    memory) but leaves the loop itself identical: same final state, same
    NLL, horizon-mean rewards."""
    plant = excenvs.InductionMachine(batch_size=4, observation_noise={"i_sd": 0.3})
    model = excenvs.InductionMachine(batch_size=4)
    _, state = plant.vmap_reset(jax.random.split(jax.random.PRNGKey(3), 4))
    controller, carry0 = foc.make_sensorless_foc(model, psi_ref=0.5, torque_ref=2.0)
    kw = dict(
        controller_carry=carry0, measured_fields=("i_sd", "i_sq"),
        process_std={"psi_rd": 0.02, "psi_rq": 0.02}, x0=jnp.zeros((4,)),
    )
    full = ofc.run_output_feedback_controller(plant, model, state, 40, controller, **kw)
    lean = ofc.run_output_feedback_controller(
        plant, model, state, 40, controller, return_trajectories=False, **kw
    )
    assert lean.observations is None and lean.belief_covs is None
    assert lean.rewards.shape == (4,)
    np.testing.assert_allclose(np.asarray(lean.nll), np.asarray(full.nll), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(lean.final_state.physical_state.psi_rd),
        np.asarray(full.final_state.physical_state.psi_rd), rtol=1e-6, atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(lean.rewards), np.asarray(full.rewards.mean(axis=1)), rtol=1e-6, atol=1e-9
    )


def test_controller_runner_validates_like_mppi():
    plant = excenvs.InductionMachine(batch_size=2, observation_noise={"i_sd": 0.3})
    model = excenvs.InductionMachine(batch_size=4)
    controller, carry0 = foc.make_sensorless_foc(model, psi_ref=0.5, torque_ref=1.0)
    _, state = plant.vmap_reset(jax.random.split(jax.random.PRNGKey(0), 2))
    with pytest.raises(ValueError, match="batch_size"):
        ofc.run_output_feedback_controller(
            plant, model, state, 4, controller, controller_carry=carry0
        )


@pytest.mark.slow
@pytest.mark.parametrize("deadtime", [0, 1])
def test_pmsm_sensorless_current_tile_in_kernel(deadtime):
    """Round-4 capstone: sensorless current control of the linear PMSM fully
    inside the fused closed-loop kernel — stationary-Kalman current observer
    assimilating the NOISY streamed measurements + decoupled PI on the
    belief.  The fleet settles on setpoints it never directly measures, the
    belief beats the raw sensor, and the kernel is draw-identical to the
    slab-consuming scan fallback in both deadtime modes."""
    from exciting_environments_tpu.ops.pallas.pmsm_stepper import (
        pmsm_fused_closed_loop,
    )
    from exciting_environments_tpu.utils.collect import tile_policy_scan

    BATCH, T, OMEGA = 1024, 400, 1200.0
    params = dict(excenvs.MotorVariant.DEFAULT.get_params().static_params.__dict__)
    params["deadtime"] = deadtime
    env = excenvs.PMSM(
        batch_size=BATCH, motor_variant=excenvs.MotorVariant.DEFAULT,
        static_params=params,
        process_noise={"i_d": 2.0, "i_q": 2.0},
        observation_noise={"i_d": 5.0, "i_q": 5.0},
    )
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(1), BATCH))
    with structures.copy_and_mutate(state, validate=True) as state:
        # the observer/law run at ONE frozen electrical speed (the LTI
        # premise); pin the fleet there
        state.physical_state.omega_el = jnp.full(BATCH, OMEGA)
    tile, carry0 = foc.make_pmsm_sensorless_current_tile(
        env, i_d_ref=-30.0, i_q_ref=60.0, omega_el=OMEGA
    )
    _obs, last, fc = pmsm_fused_closed_loop(
        env, state, tile, T, policy_carry=carry0, gather="take", interpret=True
    )
    i_d = np.asarray(last.physical_state.i_d)
    i_q = np.asarray(last.physical_state.i_q)
    assert abs(i_d.mean() + 30.0) < 2.0 and abs(i_q.mean() - 60.0) < 2.0

    # the belief filters below the raw sensor noise floor
    pn = env.env_properties.physical_normalizations
    mx, mn = float(pn.i_d.max), float(pn.i_d.min)
    belief_d = (np.asarray(fc[0]) + 1) / 2 * (mx - mn) + mn
    assert np.sqrt(np.mean((belief_d - i_d) ** 2)) < 5.0

    # kernel == slab-consuming scan, draw for draw
    out_s = tile_policy_scan(env, state, T, tile, None, False, policy_carry=carry0)
    np.testing.assert_allclose(
        i_d, np.asarray(out_s[1].physical_state.i_d), rtol=1e-9, atol=1e-9
    )


def test_pmsm_sensorless_tile_saturated_refusal():
    """The saturated drive raises with the documented gain-schedule
    rationale (stationary gain invalid under >3x inductance variation)."""
    env = excenvs.PMSM(
        batch_size=8, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA,
        observation_noise={"i_d": 1.0, "i_q": 1.0},
    )
    with pytest.raises(ValueError, match="LINEAR-magnetics"):
        foc.make_pmsm_sensorless_current_tile(env, i_d_ref=0.0, i_q_ref=10.0)


def _saturated_sensorless_setup(B_, sensor_sigma=3.0):
    env = excenvs.PMSM(
        batch_size=B_, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA,
        observation_noise={"i_d": sensor_sigma, "i_q": sensor_sigma},
    )
    tile, c0, sched = foc.make_pmsm_saturated_sensorless_current_tile(
        env, i_d_ref=-100.0, i_q_ref=150.0, omega_el=1200.0
    )
    _, st = env.vmap_reset(jax.random.split(jax.random.PRNGKey(1), B_))
    with structures.copy_and_mutate(st, validate=True) as st:
        st.physical_state.omega_el = jnp.full(B_, 1200.0)
    return env, tile, c0, sched, st


def test_pmsm_saturated_sensorless_tile_settles():
    """Round-5 headline: GAIN-SCHEDULED sensorless current control of the
    SATURATED (LUT) PMSM — the per-grid-point stationary-Kalman gain maps
    ride the scheduled-observer gather, the PI retunes to the local
    differential inductance, and a noisy-sensor fleet settles on setpoints
    it never directly measures, with belief RMSE well below the raw
    sensor noise."""
    from exciting_environments_tpu.utils.collect import tile_policy_scan

    B_ = 64
    env, tile, c0, sched, st = _saturated_sensorless_setup(B_)
    assert sched.values.shape[0] == 10  # 6 magnetics + 4 gain channels
    obs_t, acts_t, traj, last, fc = tile_policy_scan(
        env, st, 1200, tile, None, True, policy_carry=c0, sched_lut=sched
    )
    i_d = np.asarray(last.physical_state.i_d)
    i_q = np.asarray(last.physical_state.i_q)
    # mean tracking error well under 1% of the setpoints
    assert abs(i_d.mean() + 100.0) < 1.0, i_d.mean()
    assert abs(i_q.mean() - 150.0) < 1.5, i_q.mean()
    # the belief (carry planes) beats the raw 3 A sensor by a wide margin
    pn = env.env_properties.physical_normalizations
    b_d = (np.asarray(fc[0]) + 1) / 2 * float(pn.i_d.max - pn.i_d.min) + float(pn.i_d.min)
    b_q = (np.asarray(fc[1]) + 1) / 2 * float(pn.i_q.max - pn.i_q.min) + float(pn.i_q.min)
    rmse_d = float(np.sqrt(((b_d - i_d) ** 2).mean()))
    rmse_q = float(np.sqrt(((b_q - i_q) ** 2).mean()))
    assert rmse_d < 1.5 and rmse_q < 1.5, (rmse_d, rmse_q)


def test_pmsm_saturated_sensorless_tile_kernel_matches_scan():
    """The identical tile runs inside the fused closed-loop kernel (the
    scheduled 10-channel gather at the belief currents) and on the scan
    fallback, draw-identically."""
    from exciting_environments_tpu.utils.collect import tile_policy_scan

    B_ = 1024
    env, tile, c0, sched, st = _saturated_sensorless_setup(B_)
    T_ = 40
    o_k, l_k, fc_k = env.fused_closed_loop(
        st, tile, T_, interpret=True, gather="take", policy_carry=c0, sched_lut=sched
    )
    o_s, l_s, fc_s = tile_policy_scan(
        env, st, T_, tile, None, False, policy_carry=c0, sched_lut=sched
    )
    for f in ("i_d", "i_q", "torque"):
        a = np.asarray(getattr(l_k.physical_state, f))
        b = np.asarray(getattr(l_s.physical_state, f))
        np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-7, err_msg=f)
    for ck, cs in zip(fc_k, fc_s):
        np.testing.assert_allclose(np.asarray(ck), np.asarray(cs), rtol=1e-8, atol=1e-8)
    assert np.array_equal(np.asarray(l_k.PRNGKey), np.asarray(l_s.PRNGKey))


def test_pmsm_saturated_sensorless_vs_relinearizing_ekf():
    """Observer-quality comparison on IDENTICAL data: replay the recorded
    (measurement, applied-voltage) sequence of one closed-loop run through
    (a) the gain-scheduled stationary filter (the in-kernel table lookup)
    and (b) a per-step relinearizing EKF (the host-loop gold standard whose
    per-step Jacobian IS the gain schedule's limit).  The scheduled filter
    must land within 1.5x of the EKF's belief RMSE."""
    from exciting_environments_tpu.ops.lut import bilinear_gather
    from exciting_environments_tpu.utils.collect import tile_policy_scan

    B_, T_ = 32, 500
    env, tile, c0, sched, st = _saturated_sensorless_setup(B_)
    obs_t, acts_t, traj, last, fc = tile_policy_scan(
        env, st, T_, tile, None, True, policy_carry=c0, sched_lut=sched
    )
    pn = env.env_properties.physical_normalizations
    mn_d, mx_d = float(pn.i_d.min), float(pn.i_d.max)
    mn_q, mx_q = float(pn.i_q.min), float(pn.i_q.max)
    an = env.env_properties.action_normalizations
    lut = env._lut
    r_s = float(env.env_properties.static_params.r_s)
    tau = float(env.tau)
    omega = 1200.0

    # the measurement the policy saw at step t: reset obs for t=0, then the
    # post-step obs of step t-1 (its own sensor draw) — obs cols 0, 1
    obs0 = jax.vmap(env.generate_observation, in_axes=(0, env.in_axes_env_properties))(
        st, env.env_properties
    )
    z_seq = jnp.concatenate([obs0[:, None, :2], obs_t[:, :-1, :2]], axis=1)  # (B, T, 2)
    # applied voltage at step t (deadtime=1): initial buffer, then u_con[t-1]
    ucd = np.asarray(traj.physical_state.u_d_buffer)  # post-step buffers = u_con
    ucq = np.asarray(traj.physical_state.u_q_buffer)
    u_app = np.stack(
        [
            np.concatenate([np.zeros((B_, 1)), ucd[:, :-1]], axis=1),
            np.concatenate([np.zeros((B_, 1)), ucq[:, :-1]], axis=1),
        ],
        axis=-1,
    )  # (B, T, 2) physical volts
    true_d = np.asarray(traj.physical_state.i_d)
    true_q = np.asarray(traj.physical_state.i_q)

    # shared nonlinear predict (physical units)
    def f_phys(i_d, i_q, u_d, u_q):
        vals = bilinear_gather(
            lut.values, lut.x0, lut.dx, lut.y0, lut.dy, lut.nx, lut.ny, i_d, i_q
        )
        l_dd, l_dq, l_qd, l_qq, psi_d, psi_q = (vals[c] for c in range(6))
        det = l_dd * l_qq - l_dq * l_qd
        rhs_d = u_d - r_s * i_d + omega * psi_q
        rhs_q = u_q - r_s * i_q - omega * psi_d
        return (
            (l_qq * rhs_d - l_dq * rhs_q) / det,
            (-l_qd * rhs_d + l_dd * rhs_q) / det,
        )

    def step_norm(xn, un):
        i_d = (xn[0] + 1) / 2 * (mx_d - mn_d) + mn_d
        i_q = (xn[1] + 1) / 2 * (mx_q - mn_q) + mn_q
        fd, fq = f_phys(i_d, i_q, un[0], un[1])
        return jnp.stack(
            [
                2 * (i_d + tau * fd - mn_d) / (mx_d - mn_d) - 1,
                2 * (i_q + tau * fq - mn_q) / (mx_q - mn_q) - 1,
            ]
        )

    s_d = 2.0 / (mx_d - mn_d)
    s_q = 2.0 / (mx_q - mn_q)
    Q = jnp.diag(jnp.asarray([1e-6, 1e-6]))
    R = jnp.diag(jnp.asarray([(s_d * 3.0) ** 2, (s_q * 3.0) ** 2]))

    def ekf_run(z_b, u_b):
        x0 = jnp.asarray([2 * (0 - mn_d) / (mx_d - mn_d) - 1, 2 * (0 - mn_q) / (mx_q - mn_q) - 1])

        def body(carry, zt_ut):
            x, P = carry
            z, u = zt_ut
            S = P + R
            K = P @ jnp.linalg.inv(S)
            xc = x + K @ (z - x)
            Pc = (jnp.eye(2) - K) @ P
            A = jax.jacobian(step_norm)(xc, u)
            xn = step_norm(xc, u)
            Pn = A @ Pc @ A.T + Q
            return (xn, Pn), xc

        (_, _), xs = jax.lax.scan(body, (x0, Q), (z_b, u_b))
        return xs  # (T, 2) post-update beliefs

    beliefs = jax.vmap(ekf_run)(z_seq, jnp.asarray(u_app))  # (B, T, 2)
    ekf_d = (np.asarray(beliefs[..., 0]) + 1) / 2 * (mx_d - mn_d) + mn_d
    ekf_q = (np.asarray(beliefs[..., 1]) + 1) / 2 * (mx_q - mn_q) + mn_q

    # the scheduled stationary filter on the same sequence
    sched_vals = jnp.asarray(sched.values)

    def sched_run(z_b, u_b):
        x0 = jnp.asarray([2 * (0 - mn_d) / (mx_d - mn_d) - 1, 2 * (0 - mn_q) / (mx_q - mn_q) - 1])

        def body(x, zt_ut):
            z, u = zt_ut
            bi_d = (x[0] + 1) / 2 * (mx_d - mn_d) + mn_d
            bi_q = (x[1] + 1) / 2 * (mx_q - mn_q) + mn_q
            vals = bilinear_gather(
                sched_vals, lut.x0, lut.dx, lut.y0, lut.dy, lut.nx, lut.ny, bi_d, bi_q
            )
            K = jnp.asarray([[vals[6], vals[7]], [vals[8], vals[9]]])
            xc = x + K @ (z - x)
            xn = step_norm(xc, u)
            return xn, xc

        _, xs = jax.lax.scan(body, x0, (z_b, u_b))
        return xs

    sb = jax.vmap(sched_run)(z_seq, jnp.asarray(u_app))
    sch_d = (np.asarray(sb[..., 0]) + 1) / 2 * (mx_d - mn_d) + mn_d
    sch_q = (np.asarray(sb[..., 1]) + 1) / 2 * (mx_q - mn_q) + mn_q

    warm = 100  # skip the magnetization transient
    rmse = lambda a, b: float(np.sqrt(((a - b)[:, warm:] ** 2).mean()))
    r_ekf = 0.5 * (rmse(ekf_d, true_d) + rmse(ekf_q, true_q))
    r_sch = 0.5 * (rmse(sch_d, true_d) + rmse(sch_q, true_q))
    sensor = 3.0
    assert r_sch < sensor / 2, (r_sch, "should beat the raw sensor comfortably")
    assert r_sch < 1.5 * r_ekf, (r_sch, r_ekf)


def test_pmsm_saturated_sensorless_tile_guards():
    """Construction guards: linear drives point at the stationary tile,
    multistage solvers and missing sensor noise raise, and the linear
    tile's refusal names the scheduled extension."""
    env_lin = excenvs.PMSM(
        batch_size=8, motor_variant=excenvs.MotorVariant.DEFAULT,
        observation_noise={"i_d": 1.0, "i_q": 1.0},
    )
    with pytest.raises(ValueError, match="LUT-magnetics"):
        foc.make_pmsm_saturated_sensorless_current_tile(
            env_lin, i_d_ref=0.0, i_q_ref=10.0
        )
    env_ms = excenvs.PMSM(
        batch_size=8, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA,
        observation_noise={"i_d": 1.0, "i_q": 1.0}, solver="tsit5",
    )
    with pytest.raises(ValueError, match="one-stage"):
        foc.make_pmsm_saturated_sensorless_current_tile(
            env_ms, i_d_ref=-10.0, i_q_ref=10.0
        )
    env_nosensor = excenvs.PMSM(
        batch_size=8, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA,
    )
    with pytest.raises(ValueError, match="sensor"):
        foc.make_pmsm_saturated_sensorless_current_tile(
            env_nosensor, i_d_ref=-10.0, i_q_ref=10.0
        )
    env_sat = excenvs.PMSM(
        batch_size=8, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA,
        observation_noise={"i_d": 1.0, "i_q": 1.0},
    )
    with pytest.raises(ValueError, match="gain SCHEDULE"):
        foc.make_pmsm_sensorless_current_tile(env_sat, i_d_ref=0.0, i_q_ref=10.0)


def test_pmsm_saturated_sensorless_tile_sew_variant():
    """The gain schedule generalizes across motor maps: the SEW variant
    (different grid, different saturation surface, 550 V link) builds its
    own K-table and the sensorless loop settles on its (much smaller,
    ±16 A band) setpoints through the scan path."""
    from exciting_environments_tpu.utils.collect import tile_policy_scan

    B_ = 32
    env = excenvs.PMSM(
        batch_size=B_, saturated=True, motor_variant=excenvs.MotorVariant.SEW,
        observation_noise={"i_d": 0.5, "i_q": 0.5},
    )
    tile, c0, sched = foc.make_pmsm_saturated_sensorless_current_tile(
        env, i_d_ref=-8.0, i_q_ref=10.0, omega_el=400.0
    )
    lut = env._lut
    assert sched.values.shape == (10, lut.nx, lut.ny)
    _, st = env.vmap_reset(jax.random.split(jax.random.PRNGKey(3), B_))
    with structures.copy_and_mutate(st, validate=True) as st:
        st.physical_state.omega_el = jnp.full(B_, 400.0)
    _, last, fc = tile_policy_scan(
        env, st, 1200, tile, None, False, policy_carry=c0, sched_lut=sched
    )
    i_d = np.asarray(last.physical_state.i_d)
    i_q = np.asarray(last.physical_state.i_q)
    assert abs(i_d.mean() + 8.0) < 0.3, i_d.mean()
    assert abs(i_q.mean() - 10.0) < 0.3, i_q.mean()
