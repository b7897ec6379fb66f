"""Sensorless rotor-flux-oriented control (FOC) for the induction machine —
plus the EESM's dq+field current tile (:func:`make_eesm_current_tile`), which
lives here because it shares the module's cascaded-PI / anti-windup / vector-
limit toolkit even though its rotor-frame model needs no orientation step.

The canonical industrial drive-control workflow, composed from this
framework's own pieces: the EKF of
:mod:`~exciting_environments_tpu.utils.estimate` reconstructs the
unmeasurable rotor flux from noisy stator-current sensors, and the control
law here orients on that *estimated* flux — the textbook "sensorless" FOC
structure (no flux sensor, no position encoder required for the electrical
subsystem).  Run it against a noise-configured
:class:`~exciting_environments_tpu.models.induction_machine.InductionMachine`
plant through
:func:`~exciting_environments_tpu.utils.ofc.run_output_feedback_controller`:

    noisy i_s --EKF--> (i_s, psi_r) belief --FOC--> u_s --plant--> noisy i_s

Per control step the law is a handful of elementwise ops (one atan2-free
rotation built directly from the flux components, two PI updates, one
inverse rotation) — the loop cost is the OBSERVER's, not the controller's
(no (n_samples x horizon) candidate sweep like the MPPI runner pays).
Measured on device: a 4,096-drive fleet replans at 291 Hz — per plant and
control step ~10x cheaper than the drive MPPI composition
(`benchmarks/r03/foc_device.py`, `BENCHMARKS.md`).  When the true state may
be read (tuning sweeps, feasibility scans, dataset generation),
:func:`make_foc_tile` runs the identical law INSIDE the fused closed-loop
kernel as a stateful tile policy — 1.53e10 law+plant pairs/s with the
controller state on VMEM carry planes
(`benchmarks/r03/foc_in_kernel_device.py`).  And because the SCIM at frozen
rotor speed is LTI, the EKF itself collapses to a CONSTANT gain
(:func:`~exciting_environments_tpu.utils.estimate.stationary_kalman_gain`):
:func:`make_sensorless_foc_tile` runs the full sensorless loop — noisy
current measurement, Kalman assimilation, flux orientation, cascaded PI,
vector limit — in-kernel at 9.6e8 steps/s, ~800x this module's host-EKF
composition (`benchmarks/r03/sensorless_foc_in_kernel_device.py`).

The law (amplitude-invariant stationary-frame model, see the env docstring):

1. Flux orientation: ``rho = angle(psi_r)`` via the unit vector
   ``(cos rho, sin rho) = psi_r / |psi_r|`` (guarded at zero flux).
2. Park rotation of the *estimated* stator current into the flux frame:
   ``i_dq = e^{-j rho} i_s``.
3. Cascaded outer FLUX loop: ``i_d* = psi*/L_m + PI(psi* - |psi_hat|)``.
   The feedforward alone (the continuous steady-state relation
   ``psi = L_m i_d``) is systematically wrong on a discretized plant —
   explicit Euler at ``omega tau ~ 0.03`` rad/step inflates the flux gain
   by ``(h/tau_r) / (1 - |1 + h(-1/tau_r + j omega)|) ~ 1.9x`` — so the
   outer loop regulates the *estimated* flux magnitude to the setpoint
   regardless of discretization or parameter error.  Torque-producing
   reference ``i_q* = T* / (1.5 p (L_m/L_r) max(|psi_hat|, psi_floor))``.
4. Magnetize-first torque gating: ``i_q*`` ramps in only once the
   *estimated* flux has built past half its setpoint.  Applying torque
   current into a weak flux is the classic startup failure — the flux
   overshoots into the region where the back-EMF ``omega k_r psi`` exceeds
   the inverter voltage, the q-axis loop saturates permanently and the
   drive locks into a railed equilibrium (reproduced in
   ``tests/test_foc.py`` history before the gate existed).
5. Discrete PI loops on ``(i_d* - i_d, i_q* - i_q)`` with the textbook
   decoupling feedforward ``u_d += -omega_s sigma L_s i_q``,
   ``u_q += omega_s (sigma L_s i_d + k_r |psi_hat|)`` at the slip-adjusted
   synchronous speed ``omega_s = omega + L_m i_q / (tau_r |psi_hat|)``
   (without it the integrators must supply the entire back-EMF — hundreds
   of volts of slowly-learned state standing between a railed transient
   and recovery), and BACK-CALCULATION anti-windup: the integrators track
   the applied (limited) voltage,
   ``int += ki tau e + (tau ki / kp)(u_applied - u_unsat)``, so a railed
   transient UNWINDS instead of freezing — pure conditional integration
   deadlocks here: a flux overshoot rails the inverter, freezing the
   wound-up integrators at exactly the values that keep it railed
   (reproduced in ``tests/test_foc.py`` history).  The outer flux loop
   back-calculates against the ACHIEVED d-current (bounding its integrator
   on the ``i_max`` clip and tracking the plant through railed transients)
   and uses DIRECTIONAL conditional integration against voltage
   saturation: while the inverter is railed the flux error integrates only
   in the direction that shrinks the current command — a railed
   equilibrium is self-consistent, so symmetric freezing would park the
   drive above the setpoint forever.
6. Voltage-VECTOR limiting ``|u_dq| <= u_lim`` (per-axis clipping would
   distort the command direction under saturation), inverse rotation
   ``u_s = e^{j rho} u_dq``, and normalization onto the env's action band.

No reference counterpart (the reference ships neither the induction
machine, nor observers, nor controllers).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "make_sensorless_foc",
    "make_foc_tile",
    "make_sensorless_foc_tile",
    "make_eesm_current_tile",
    "make_pmsm_sensorless_current_tile",
    "make_pmsm_saturated_sensorless_current_tile",
]


def make_sensorless_foc(
    model,
    *,
    psi_ref: float,
    torque_ref: float,
    kp: float = 40.0,
    ki: float = 8000.0,
    kp_psi: float = 10.0,
    ki_psi: float = 200.0,
    psi_floor: float = 0.05,
    i_max: float = None,
    field_weakening: bool = False,
    u_margin: float = 0.85,
):
    """Build a rotor-flux-oriented PI current controller for the
    :class:`~exciting_environments_tpu.models.induction_machine.InductionMachine`.

    Args:
        model: the deterministic InductionMachine twin (its static params
            supply ``L_m``/``L_r``/``p`` for the current references and its
            action normalization the voltage band).  Heterogeneous
            per-batch params are fine — the law broadcasts.
        psi_ref: rotor-flux-magnitude setpoint [Vs] (``i_d* = psi_ref/L_m``).
            Must be a feasible operating point: the steady back-EMF
            ``omega * (L_m/L_r) * psi_ref`` plus resistive/coupling drops
            has to fit inside the voltage circle with margin — otherwise
            the drive parks on the voltage limit with frozen integrators.
            For high-speed machines pass ``field_weakening=True`` to derate
            the setpoint automatically.
        torque_ref: electromagnetic-torque setpoint [Nm].
        kp / ki: current-loop PI gains [V/A] and [V/(A s)] — the defaults
            are a deadbeat-ish tuning for the default machine at tau = 1e-4
            (sigma*L_s ~ 21 mH: kp = 40 places the current-loop bandwidth
            near 2 krad/s).
        kp_psi / ki_psi: outer flux-loop PI gains [A/Vs] and [A/(Vs s)] —
            an order of magnitude slower than the current loop (cascade
            separation).
        psi_floor: lower clamp [Vs] on the flux magnitude used in the
            ``i_q*`` division and the orientation unit vector, so startup
            from zero flux is well-defined.
        i_max: current-command limit [A] (standard drive practice: the flux
            reference has priority, the torque reference gets the remaining
            circle ``sqrt(i_max^2 - i_d*^2)`` — this also caps the startup
            ``i_q*`` spike while the estimated flux sits at ``psi_floor``).
            Default: 90% of the model's stator-current normalization band.
        field_weakening: derate the flux setpoint above base speed with the
            standard ``1/omega`` feedforward law
            ``psi* = min(psi_ref, u_margin * u_lim / (|omega| L_m/L_r))`` so
            the back-EMF ``omega (L_m/L_r) psi`` never exceeds
            ``u_margin * u_lim`` — without it a high-speed machine parks ON
            the voltage limit with frozen integrators (the infeasibility
            warned about under ``psi_ref``).  Uses the model's frozen
            electrical rotor speed (per-batch ``omega`` broadcasts: each
            instance weakens at its own speed); the ``1 - u_margin`` slack
            absorbs the resistive/leakage-reactance drops and slip.
        u_margin: fraction of the voltage-vector limit the back-EMF may
            occupy under field weakening.

    Returns:
        ``(controller, carry0)`` for
        :func:`~exciting_environments_tpu.utils.ofc.run_output_feedback_controller`:
        ``controller(belief_state, carry, k) -> (normalized_action, carry)``
        with ``carry = (int_d, int_q, int_psi, free)`` — the current-loop
        integrators [V], the flux-loop integrator [A], and the anti-windup
        "voltage vector was unsaturated" flag.
    """
    params = model.env_properties.static_params
    tau = float(model.tau)
    act_norms = model.env_properties.action_normalizations
    # The vector limit + `u / u_max` normalization preserve the command
    # DIRECTION only when denormalization is linear through zero, i.e. the
    # action band is symmetric (min == -max); an asymmetric band would
    # silently apply a DC offset voltage, so reject it loudly.  Per-batch
    # (B,)-shaped symmetric bands are fine — everything below broadcasts.
    for ax in ("u_sd", "u_sq"):
        norm = getattr(act_norms, ax)
        if not np.allclose(np.asarray(norm.min), -np.asarray(norm.max)):
            raise ValueError(
                f"make_sensorless_foc needs a symmetric {ax} action band "
                f"(min == -max) to keep the voltage-vector limit "
                f"orientation-preserving; got min={norm.min}, max={norm.max}"
            )
    # scalar constants stay PYTHON floats (the kernel tile variant closes
    # over them — Pallas rejects captured device constants); per-batch
    # (B,)-shaped bands become arrays and broadcast in the belief-space law
    def _maybe_scalar(v):
        a = np.asarray(v)
        return float(a) if a.ndim == 0 else jnp.asarray(a)

    u_max_d = _maybe_scalar(act_norms.u_sd.max)
    u_max_q = _maybe_scalar(act_norms.u_sq.max)
    if i_max is None:
        i_norm = model.env_properties.physical_normalizations.i_sd
        lo, hi = _maybe_scalar(i_norm.min), _maybe_scalar(i_norm.max)
        if isinstance(lo, float) and isinstance(hi, float):
            i_max = 0.9 * min(abs(lo), abs(hi))
        else:
            i_max = 0.9 * jnp.minimum(jnp.abs(jnp.asarray(lo)), jnp.abs(jnp.asarray(hi)))
    else:
        i_max = _maybe_scalar(i_max)
    B = model.batch_size
    carry0 = (jnp.zeros((B,)), jnp.zeros((B,)), jnp.zeros((B,)), jnp.ones((B,), bool))

    # stationary components of |u_dq| <= u_lim stay inside the band
    if isinstance(u_max_d, float) and isinstance(u_max_q, float):
        u_lim = min(u_max_d, u_max_q)
    else:
        u_lim = jnp.minimum(u_max_d, u_max_q)

    # effective flux setpoint: constant below base speed, 1/omega feedforward
    # field weakening above it (omega is a frozen static param, so this is a
    # construction-time constant — possibly per-batch)
    psi_star = psi_ref
    if field_weakening:
        omega = model.env_properties.static_params.omega
        k_r0 = params.l_m / params.l_r
        if np.ndim(omega) == 0 and isinstance(u_lim, float):
            # scalar path stays a Python float (kernel-tile closure safe)
            psi_star = min(
                psi_ref,
                u_margin * u_lim / (max(abs(float(omega)), 1e-6) * float(k_r0)),
            )
        else:
            psi_star = jnp.minimum(
                psi_ref, u_margin * u_lim / (jnp.maximum(jnp.abs(omega), 1e-6) * k_r0)
            )

    def law(i_sd_v, i_sq_v, psi_rd_v, psi_rq_v, carry, k):
        k_r = params.l_m / params.l_r
        # 1. orientation from the ESTIMATED flux (never the plant's).
        # Below the flux floor there is nothing to orient on — fall back to
        # a frame rotating AT THE ROTOR SPEED (a known static param).  A
        # fixed fallback axis would command DC stator current, and a
        # spinning rotor shorts DC excitation to
        # |psi| = L_m i / sqrt(1 + (omega tau_r)^2) ~ 0.03 Vs here — below
        # the floor, so the drive could never magnetize (flux pickup on a
        # rotating machine must synchronize the current vector first).
        psi_mag = jnp.sqrt(psi_rd_v**2 + psi_rq_v**2)
        denom = jnp.maximum(psi_mag, psi_floor)
        theta_f = params.omega * tau * k
        use_est = psi_mag > psi_floor
        cos_rho = jnp.where(use_est, psi_rd_v / denom, jnp.cos(theta_f))
        sin_rho = jnp.where(use_est, psi_rq_v / denom, jnp.sin(theta_f))
        # 2. estimated currents into the flux frame
        i_d = cos_rho * i_sd_v + sin_rho * i_sq_v
        i_q = cos_rho * i_sq_v - sin_rho * i_sd_v
        # 3. current references: outer flux PI (feedforward + correction of
        # the discretization/parameter gain error) and the torque relation,
        # limited to the command circle (flux priority — standard FOC
        # current limiting)
        int_d, int_q, int_psi, free_c = carry
        # the anti-windup flag rides as bool in the belief-space carry and
        # as a 1.0/0.0 float plane in the kernel tile carry — normalize
        free = free_c > 0
        e_psi = psi_star - psi_mag
        i_d_raw = psi_star / params.l_m + kp_psi * e_psi + int_psi
        i_d_ref = jnp.clip(i_d_raw, -i_max, i_max)
        # cascade anti-windup, two complementary pieces:
        # - DIRECTIONAL conditional integration: while the inverter is
        #   railed (previous-step flag — the inner current loop has no
        #   authority then) integrate only in the direction that SHRINKS
        #   the flux command.  Plain conditional integration deadlocks: a
        #   railed equilibrium is self-consistent (the achieved flux/current
        #   are whatever the limited voltage delivers), so with the error
        #   term frozen nothing ever commands the flux back inside the
        #   feasible circle.
        # - back-calculation against the ACHIEVED d-current, which bounds
        #   int_psi when the command sits on the i_max clip (infeasible
        #   psi_ref) and tracks the plant through voltage-railed transients.
        unwind = e_psi * i_d_raw < 0.0
        int_psi = (
            int_psi
            + jnp.where(free | unwind, ki_psi * tau * e_psi, 0.0)
            + (tau * ki_psi / kp_psi) * (i_d - i_d_raw)
        )
        i_q_cap = jnp.sqrt(jnp.maximum(i_max**2 - i_d_ref**2, 0.0))
        i_q_ref = jnp.clip(
            torque_ref / (1.5 * params.p * k_r * denom), -i_q_cap, i_q_cap
        )
        # 4. magnetize first: torque current only once the estimated flux
        # has built (ramp open over [0.5, 0.75]*psi_ref)
        gate = jnp.clip((psi_mag - 0.5 * psi_star) / (0.25 * psi_star), 0.0, 1.0)
        i_q_ref = gate * i_q_ref
        # 5. PI with decoupling feedforward at the slip-adjusted synchronous
        # speed (the indirect-FOC slip relation, on ESTIMATED quantities):
        # the feedforward carries the back-EMF and cross-coupling so the PI
        # only closes the small-signal loop
        e_d = i_d_ref - i_d
        e_q = i_q_ref - i_q
        sigma_l_s = params.l_s - params.l_m * k_r
        omega_s = params.omega + params.l_m * i_q / (
            (params.l_r / params.r_r) * denom
        )
        u_d_unsat = kp * e_d + int_d - omega_s * sigma_l_s * i_q
        u_q_unsat = kp * e_q + int_q + omega_s * (sigma_l_s * i_d + k_r * psi_mag)
        # 6. voltage-VECTOR limit (per-axis clipping would distort the
        # command direction under saturation), back-calculation tracking of
        # the applied voltage (see module docstring: this is what lets a
        # railed transient unwind), then back to the stationary frame,
        # normalized onto the action band
        u_mag = jnp.sqrt(u_d_unsat**2 + u_q_unsat**2)
        scale = jnp.minimum(1.0, u_lim / jnp.maximum(u_mag, 1e-9))
        u_d = u_d_unsat * scale
        u_q = u_q_unsat * scale
        k_t = tau * ki / kp  # tracking gain: T_t = kp/ki (the PI's own T_i)
        int_d = int_d + ki * tau * e_d + k_t * (u_d - u_d_unsat)
        int_q = int_q + ki * tau * e_q + k_t * (u_q - u_q_unsat)
        u_sd = cos_rho * u_d - sin_rho * u_q
        u_sq = sin_rho * u_d + cos_rho * u_q
        flag = (u_mag <= u_lim).astype(jnp.asarray(free_c).dtype)
        return (u_sd / u_max_d, u_sq / u_max_q), (int_d, int_q, int_psi, flag)

    def controller(belief, carry, k):
        phys = belief.physical_state
        (a_d, a_q), carry = law(phys.i_sd, phys.i_sq, phys.psi_rd, phys.psi_rq, carry, k)
        return jnp.stack([a_d, a_q], axis=-1), carry

    controller._law = law  # shared body for make_foc_tile
    return controller, carry0


def make_foc_tile(model, **law_kwargs):
    """The same rotor-flux-oriented law as :func:`make_sensorless_foc`, but
    packaged as a STATEFUL TILE POLICY for the fused closed-loop kernel —
    full-STATE feedback FOC at kernel speed.

    Where the sensorless composition pays the observer per control step
    (the EKF dominates its ~1e6 triples/s), a simulation study that may
    read the true state — controller tuning sweeps, feasibility scans,
    dataset generation under a realistic drive law — can run the identical
    law INSIDE the kernel: observations are denormalized to physical
    values on the tiles, the PI integrators and anti-windup flag ride VMEM
    carry planes, and the whole loop runs at fused-rollout throughput
    (`BENCHMARKS.md`).

    Args:
        model: the :class:`InductionMachine` (scalar normalizations and
            static params — the kernel folds them into the program).
        **law_kwargs: forwarded to :func:`make_sensorless_foc`
            (``psi_ref``/``torque_ref`` required; gains, ``i_max``,
            ``field_weakening`` optional).

    Returns:
        ``(policy_tile, carry0)`` for
        ``env.fused_closed_loop(..., policy_carry=carry0)`` /
        ``FleetRunner.run_policy(..., policy_carry=carry0)`` /
        ``RolloutCollector.collect_policy_fused(..., policy_carry=carry0)``
        — ``policy_tile(obs, t, carry) -> ((a_sd, a_sq), carry)`` with the
        anti-windup flag as a 1.0/0.0 float plane (kernel carries are
        float).
    """
    controller, carry0 = make_sensorless_foc(model, **law_kwargs)
    law = controller._law
    spans = _scalar_spans(model, "make_foc_tile")

    def policy_tile(obs, t, carry):
        i_sd_v, i_sq_v, psi_rd_v, psi_rq_v = (
            (o + 1) / 2 * (mx - mn) + mn for o, (mn, mx) in zip(obs[:4], spans)
        )
        return law(i_sd_v, i_sq_v, psi_rd_v, psi_rq_v, carry, t)

    carry0_tile = carry0[:3] + (jnp.ones((model.batch_size,)),)
    return policy_tile, carry0_tile


def _scalar_spans(model, what):
    pn = model.env_properties.physical_normalizations
    try:
        return tuple(
            (float(getattr(pn, n).min), float(getattr(pn, n).max))
            for n in ("i_sd", "i_sq", "psi_rd", "psi_rq")
        )
    except TypeError as e:
        raise ValueError(
            f"{what} needs scalar physical normalizations (the fused "
            "closed-loop kernel folds them into the program); per-batch "
            "bands only work through the belief-space controller"
        ) from e


def make_sensorless_foc_tile(
    model,
    *,
    measured_fields=("i_sd", "i_sq"),
    process_std=None,
    measurement_std=None,
    q_floor: float = 1e-8,
    **law_kwargs,
):
    """TRUE sensorless FOC fully inside the fused closed-loop kernel:
    stationary-Kalman flux observer + rotor-flux-oriented law, one stateful
    tile policy.

    Where :func:`make_foc_tile` reads the plant's full state (flux included
    — a simulation-study shortcut), this tile reads ONLY the measured
    stator-current observation columns — on a stochastic plant
    (``observation_noise`` on ``i_sd``/``i_sq``) those are the NOISY sensor
    values the closed-loop kernel streams — and reconstructs the rotor flux
    with the steady-state Kalman observer of
    :func:`~exciting_environments_tpu.utils.estimate.stationary_kalman_gain`
    (the SCIM at frozen rotor speed is LTI, so the EKF's Riccati recursion
    converges to ONE constant gain; the transition matrices come from
    ``jax.jacobian`` of the env's own step, the gain from the env's own
    noise configuration).  Per step the observer is a ``K``-correction on
    the innovation plus an ``A x + B u`` predict — scalar-weighted FMAs on
    VMEM carry planes — so the full sensorless loop
    (measure → assimilate → orient → cascade PI → limit) runs at fused
    closed-loop throughput, four orders of magnitude above the per-step
    host EKF composition of
    :func:`~exciting_environments_tpu.utils.ofc.run_output_feedback_controller`
    (`BENCHMARKS.md`).

    Args:
        model: the :class:`InductionMachine` the loop will run on.  Its
            ``process_noise``/``observation_noise`` configuration doubles as
            the observer's Q/R (a filter matched to the simulated
            disturbances); scalar normalizations and static params required.
        measured_fields: observation columns the law may read (default: the
            stator currents — the flux columns are never touched, which is
            what "sensorless" means).
        process_std / measurement_std / q_floor: observer-tuning overrides,
            see :func:`stationary_kalman_gain`.
        **law_kwargs: forwarded to :func:`make_sensorless_foc`
            (``psi_ref``/``torque_ref`` required; gains optional).

    Returns:
        ``(policy_tile, carry0)`` for
        ``env.fused_closed_loop(..., policy_carry=carry0)`` — the carry is
        the 4 normalized observer planes followed by the 4 FOC controller
        planes.  The same tuple drives ``FleetRunner.run_policy`` and
        ``RolloutCollector.collect_policy_fused``; on the CPU backend the
        identical tile rides ``tile_policy_scan`` draw for draw.
    """
    from exciting_environments_tpu.utils.estimate import stationary_kalman_gain

    controller, carry0 = make_sensorless_foc(model, **law_kwargs)
    law = controller._law
    spans = _scalar_spans(model, "make_sensorless_foc_tile")

    sk = stationary_kalman_gain(
        model,
        measured_fields=tuple(measured_fields),
        process_std=process_std,
        measurement_std=measurement_std,
        q_floor=q_floor,
    )
    n = len(sk.names)
    if n != 4 or sk.names != ("i_sd", "i_sq", "psi_rd", "psi_rq"):
        raise ValueError(
            "make_sensorless_foc_tile expects the InductionMachine state "
            f"order ('i_sd', 'i_sq', 'psi_rd', 'psi_rq'); got {sk.names}"
        )
    # compile-time Python floats: the kernel closes over them (Pallas
    # rejects captured device constants); drop exact zeros to skip dead FMAs
    A = [[float(v) for v in row] for row in sk.A]
    Bm = [[float(v) for v in row] for row in sk.B]
    cv = [float(v) for v in sk.c]
    K = [[float(v) for v in row] for row in sk.K]
    midx = [int(v) for v in sk.midx]
    zcols = [int(v) for v in sk.zidx]
    n_meas = len(midx)

    def policy_tile(obs, t, carry):
        xh = carry[:n]  # predicted normalized belief x(t | t-1)
        innov = tuple(obs[zcols[k]] - xh[midx[k]] for k in range(n_meas))
        xc = tuple(
            xh[i]
            + sum((K[i][k] * innov[k] for k in range(n_meas) if K[i][k] != 0.0), 0.0)
            for i in range(n)
        )
        phys = tuple(
            (x + 1.0) / 2.0 * (mx - mn) + mn for x, (mn, mx) in zip(xc, spans)
        )
        (a_d, a_q), foc_c = law(phys[0], phys[1], phys[2], phys[3], tuple(carry[n:]), t)
        # predict with the action the kernel is about to apply (normalized,
        # exactly what the observer's B was linearized against)
        acts = (a_d, a_q)
        xn = tuple(
            cv[i]
            + sum((A[i][j] * xc[j] for j in range(n) if A[i][j] != 0.0), 0.0)
            + sum((Bm[i][k] * acts[k] for k in range(len(acts)) if Bm[i][k] != 0.0), 0.0)
            for i in range(n)
        )
        return acts, xn + tuple(foc_c)

    B_ = model.batch_size
    carry0_tile = tuple(jnp.zeros((B_,)) for _ in range(n)) + carry0[:3] + (
        jnp.ones((B_,)),
    )
    return policy_tile, carry0_tile


def make_eesm_current_tile(
    model,
    *,
    i_d_ref: float,
    i_q_ref: float,
    i_f_ref: float,
    kp: float = None,
    ki: float = None,
    kp_f: float = None,
    ki_f: float = None,
):
    """dq + field PI current controller for the
    :class:`~exciting_environments_tpu.models.eesm.EESM`, packaged as a
    STATEFUL TILE POLICY for the fused closed-loop kernel.

    The EESM integrates in the rotor frame, so unlike the induction
    machine's law there is no orientation step — the dq frame IS the
    control frame (rotor-position orientation is implicit in the model).
    What the law must handle instead is the machine's defining control
    difficulty: the d-axis and the field winding are transformer-coupled
    through ``l_m``, so the q-axis back-EMF feedforward carries the field
    contribution ``omega_el l_m i_f`` on top of the speed cross-terms
    (``-omega_el l_q i_q`` / ``+omega_el l_d i_d``); the d/field
    transformer transient itself (``l_m di_f/dt``) is left for the PI
    loops to close.  Three
    PI integrators ride VMEM carry planes; the stator pair is limited as a
    voltage VECTOR (per-axis clipping would distort the command direction)
    and the field voltage per-axis, both with back-calculation anti-windup
    tracking the applied voltage.

    Default gains place the current loops at ~2 krad/s (stator) and
    ~400 rad/s (field) for the machine's own transient inductances
    (``sigma_l_d = D/l_f``, ``sigma_l_f = D/l_d``): ``kp = 2000 sigma_l_d``
    etc., integral time 5 ms / 20 ms.

    Args:
        model: the :class:`EESM` (scalar normalizations and static params —
            the kernel folds them into the program as compile-time
            constants; per-batch params need the belief-space path).
        i_d_ref / i_q_ref / i_f_ref: current setpoints [A] — Python
            scalars (the kernel closes over them as compile-time
            constants; per-instance setpoints go through the scan path
            with a hand-written law).
        kp / ki: stator current-loop PI gains [V/A], [V/(A s)].
        kp_f / ki_f: field current-loop PI gains.

    Returns:
        ``(policy_tile, carry0)`` for
        ``env.fused_closed_loop(..., policy_carry=carry0)`` /
        ``FleetRunner.run_policy`` / ``RolloutCollector.collect_policy_fused``
        — ``policy_tile(obs, t, carry) -> ((a_d, a_q, a_f), carry)`` with
        ``carry = (int_d, int_q, int_f)`` integrator planes [V].
    """

    def _scalar(name):
        v = np.asarray(getattr(model.env_properties.static_params, name))
        if v.ndim != 0:
            raise ValueError(
                f"make_eesm_current_tile needs scalar static params (the "
                f"kernel folds them into the program); {name} has shape "
                f"{v.shape} — run per-batch machines through vmap_step with "
                f"a host-side law instead"
            )
        return float(v)

    for _name, _v in (("i_d_ref", i_d_ref), ("i_q_ref", i_q_ref), ("i_f_ref", i_f_ref)):
        if np.ndim(_v) != 0:
            raise ValueError(
                f"make_eesm_current_tile needs scalar setpoints (the kernel "
                f"closes over them); {_name} has shape {np.shape(_v)}"
            )
    i_d_ref, i_q_ref, i_f_ref = float(i_d_ref), float(i_q_ref), float(i_f_ref)

    r_s, r_f = _scalar("r_s"), _scalar("r_f")
    l_d, l_q, l_f, l_m = _scalar("l_d"), _scalar("l_q"), _scalar("l_f"), _scalar("l_m")
    omega_el = _scalar("omega_el")
    tau = float(model.tau)
    det = l_d * l_f - l_m * l_m
    sigma_l_d, sigma_l_f = det / l_f, det / l_d
    kp = 2000.0 * sigma_l_d if kp is None else kp
    ki = kp / 5e-3 if ki is None else ki
    kp_f = 400.0 * sigma_l_f if kp_f is None else kp_f
    ki_f = kp_f / 20e-3 if ki_f is None else ki_f

    act_norms = model.env_properties.action_normalizations
    for ax in ("u_d", "u_q", "u_f"):
        norm = getattr(act_norms, ax)
        if not np.allclose(np.asarray(norm.min), -np.asarray(norm.max)):
            raise ValueError(
                f"make_eesm_current_tile needs a symmetric {ax} action band "
                f"(min == -max); got min={norm.min}, max={norm.max}"
            )
    u_max_d = float(np.asarray(act_norms.u_d.max))
    u_max_q = float(np.asarray(act_norms.u_q.max))
    u_max_f = float(np.asarray(act_norms.u_f.max))
    u_lim = min(u_max_d, u_max_q)

    pn = model.env_properties.physical_normalizations
    try:
        spans = tuple(
            (float(getattr(pn, n).min), float(getattr(pn, n).max))
            for n in ("i_d", "i_q", "i_f")
        )
    except TypeError as e:
        raise ValueError(
            "make_eesm_current_tile needs scalar physical normalizations "
            "(the fused closed-loop kernel folds them into the program)"
        ) from e

    def policy_tile(obs, t, carry):
        i_d, i_q, i_f = (
            (o + 1.0) / 2.0 * (mx - mn) + mn for o, (mn, mx) in zip(obs[:3], spans)
        )
        int_d, int_q, int_f = carry
        e_d = i_d_ref - i_d
        e_q = i_q_ref - i_q
        e_f = i_f_ref - i_f
        # decoupling feedforward: resistive drop at the setpoint, speed
        # cross-terms on the MEASURED currents (so the PI closes only the
        # small-signal loop)
        u_d_unsat = kp * e_d + int_d + r_s * i_d_ref - omega_el * l_q * i_q
        u_q_unsat = kp * e_q + int_q + r_s * i_q_ref + omega_el * (l_d * i_d + l_m * i_f)
        u_f_unsat = kp_f * e_f + int_f + r_f * i_f_ref
        # stator voltage-VECTOR limit, field per-axis clip
        u_mag = jnp.sqrt(u_d_unsat**2 + u_q_unsat**2)
        scale = jnp.minimum(1.0, u_lim / jnp.maximum(u_mag, 1e-9))
        u_d = u_d_unsat * scale
        u_q = u_q_unsat * scale
        u_f = jnp.clip(u_f_unsat, -u_max_f, u_max_f)
        # back-calculation anti-windup (tracking time = the PI's own T_i)
        int_d = int_d + ki * tau * e_d + (tau * ki / kp) * (u_d - u_d_unsat)
        int_q = int_q + ki * tau * e_q + (tau * ki / kp) * (u_q - u_q_unsat)
        int_f = int_f + ki_f * tau * e_f + (tau * ki_f / kp_f) * (u_f - u_f_unsat)
        return (u_d / u_max_d, u_q / u_max_q, u_f / u_max_f), (int_d, int_q, int_f)

    B = model.batch_size
    carry0 = (jnp.zeros((B,)), jnp.zeros((B,)), jnp.zeros((B,)))
    return policy_tile, carry0


def make_pmsm_sensorless_current_tile(
    model,
    *,
    i_d_ref: float,
    i_q_ref: float,
    omega_el: float = None,
    kp_d: float = None,
    kp_q: float = None,
    ki_d: float = None,
    ki_q: float = None,
    process_std: dict = None,
    measurement_std: dict = None,
    q_floor: float = 1e-6,
):
    """Sensorless current control of the LINEAR-magnetics PMSM drive fully
    inside the fused closed-loop kernel: stationary-Kalman current observer
    + decoupled PI current law, one stateful tile policy.

    The drive's only measurements are the NOISY normalized current columns
    the stochastic closed-loop kernel streams (``observation_noise`` on
    ``i_d``/``i_q``); the tile assimilates them with a CONSTANT Kalman gain
    and closes the current loop on the filtered belief — the same
    measure → assimilate → control composition
    :func:`make_sensorless_foc_tile` runs for the induction machine, here
    for the machine the framework is named after.  Validity rests on three
    structural facts, each enforced at construction:

    * at frozen electrical speed the linear-magnetics dq current subsystem
      is LTI (``PMSM.linear_ode``), so the EKF's Riccati recursion
      collapses to one constant gain.  The discrete transition is the
      affine map of the env's OWN solver step over ``tau`` (extracted with
      ``jax.jacobian`` — exact for any explicit RK method on a linear
      ODE), folded into normalized observation coordinates;
    * the PI commands are vector-limited to the hexagon's INSCRIBED circle
      (``|u_dq| <= u_dc / sqrt(3)``), where the inverter constraint is
      provably inactive — the voltage the kernel applies IS the command
      the observer predicted with (the rotate-clip-rotate composition is
      the identity there), so the observer model stays consistent;
    * ``deadtime`` in {0, 1}: under deadtime the voltage applied at step
      ``t`` is the command from ``t - 1``, carried as two extra belief
      planes so the predict uses the physically applied voltage.

    SATURATED-DRIVE REFUSAL (measured, not aspirational): with LUT
    magnetics the differential-inductance matrix varies along the
    trajectory, so no constant gain is simultaneously correct at the
    origin and at the MTPA operating point — on the BRUSA map the d-axis
    differential inductance falls by >3x from zero current to rated
    current, i.e. a stationary gain tuned at either point mis-weights
    innovations by that factor at the other.  A gain-scheduled observer
    (LUT-indexed K) is the principled extension; until it exists the
    saturated drive raises here and runs output feedback through the
    host-side EKF (:func:`~exciting_environments_tpu.utils.ofc.
    run_output_feedback_controller`), whose per-step relinearization IS
    the gain schedule.

    Args:
        model: a linear-magnetics :class:`PMSM` with scalar properties and
            ``deadtime`` in {0, 1}.  Its ``process_noise`` /
            ``observation_noise`` configuration doubles as the observer's
            Q/R (a filter matched to the simulated disturbances).
        i_d_ref / i_q_ref: current setpoints [A], Python scalars.
        omega_el: the frozen electrical speed [rad/s] the fleet runs at
            (default: the mid-band speed ``init_state`` resets to).  The
            transition matrices are built at this speed.
        kp_d / kp_q / ki_d / ki_q: PI gains (defaults place both loops at
            ~2 krad/s for the machine's own inductances, integral time
            5 ms).
        process_std / measurement_std: per-field overrides of the env's
            noise config for the observer's Q/R [physical units].
        q_floor: diagonal process-covariance floor (normalized units^2) —
            keeps the Riccati iteration well-posed for a noise-free plant
            and doubles as the standard fictitious process noise.  The
            default 1e-6 matters on sensor-only plants: at 1e-8 the
            stationary gain trusts the model almost completely, so the
            (unknown) initial current error decays only at the plant's own
            electrical time constant — measured on the default machine
            with 5 A sensors, belief RMSE 6.7 A (worse than the raw
            sensor) at 1e-8 vs 1.5 A at 1e-6.

    Returns:
        ``(policy_tile, carry0)`` for ``env.fused_closed_loop(...,
        policy_carry=carry0)`` / ``FleetRunner.run_policy`` /
        ``RolloutCollector.collect_policy_fused`` — the carry is the 2
        normalized belief planes, the 2 PI integrators [V], and (deadtime
        only) the 2 previous normalized commands.  The identical tile
        rides ``tile_policy_scan`` draw for draw on the CPU backend.
    """
    import jax
    import numpy as np

    from exciting_environments_tpu.ops.pallas.stepper import _rk_step

    props = model.env_properties
    if bool(props.saturated):
        raise ValueError(
            "make_pmsm_sensorless_current_tile covers the LINEAR-magnetics "
            "drive only: with LUT saturation the differential inductance "
            "varies >3x over the operating range (BRUSA map), so no single "
            "stationary gain is uniformly correct — use "
            "make_pmsm_saturated_sensorless_current_tile, whose "
            "LUT-gathered gain SCHEDULE runs the required per-operating-"
            "point retuning fully in-kernel"
        )

    def _scalar(name):
        v = np.asarray(getattr(props.static_params, name))
        if v.ndim != 0:
            raise ValueError(
                f"make_pmsm_sensorless_current_tile needs scalar static "
                f"params; {name} has shape {v.shape}"
            )
        return float(v)

    r_s, l_d, l_q, psi_p = (_scalar(n) for n in ("r_s", "l_d", "l_q", "psi_p"))
    u_dc = _scalar("u_dc")
    deadtime = int(_scalar("deadtime"))
    if deadtime not in (0, 1):
        raise ValueError("deadtime must be 0 or 1")
    tau = float(model.tau)

    pn = props.physical_normalizations
    try:
        spans = {
            n: (float(getattr(pn, n).min), float(getattr(pn, n).max))
            for n in ("i_d", "i_q", "omega_el")
        }
        an = props.action_normalizations
        aspans = {
            n: (float(getattr(an, n).min), float(getattr(an, n).max))
            for n in ("u_d", "u_q")
        }
    except TypeError as e:
        raise ValueError(
            "make_pmsm_sensorless_current_tile needs scalar normalizations "
            "(the fused closed-loop kernel folds them into the program)"
        ) from e

    if omega_el is None:
        omega_el = 0.5 * (spans["omega_el"][0] + spans["omega_el"][1])
    omega_el = float(omega_el)

    # ---- discrete affine transition in NORMALIZED coordinates -----------
    # one env solver step of the LTI current subsystem at frozen speed,
    # commanded voltages inside the hexagon's inscribed circle (constraint
    # provably inactive there) — exact for any explicit RK on a linear ODE
    solver = model._solver

    def _phys_step(y, u):
        def ode(t, yy, act):
            i_d, i_q = yy
            return (
                (act[0] + omega_el * l_q * i_q - r_s * i_d) / l_d,
                (act[1] - omega_el * (l_d * i_d + psi_p) - r_s * i_q) / l_q,
            )

        return _rk_step(ode, solver, y, u, tau, 0.0)

    def _norm_map(v):
        xn, a = v[:2], v[2:]
        x = tuple(
            (xi + 1.0) / 2.0 * (mx - mn) + mn
            for xi, (mn, mx) in zip(xn, (spans["i_d"], spans["i_q"]))
        )
        u = tuple(
            (ai + 1.0) / 2.0 * (mx - mn) + mn
            for ai, (mn, mx) in zip(a, (aspans["u_d"], aspans["u_q"]))
        )
        x1 = _phys_step(x, u)
        return jnp.stack(
            [
                2.0 * (xi - mn) / (mx - mn) - 1.0
                for xi, (mn, mx) in zip(x1, (spans["i_d"], spans["i_q"]))
            ]
        )

    v0 = jnp.zeros((4,), jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    J = np.asarray(jax.jacobian(_norm_map)(v0), np.float64)
    c_n = np.asarray(_norm_map(v0), np.float64)
    A_n, B_n = J[:, :2], J[:, 2:]
    # linearity check at a random probe (a nonlinear config must not slip
    # through silently); tolerance scales with the trace dtype — without
    # x64 the jacobian itself carries f32 rounding, and the failure mode
    # this guards against (LUT magnetics slipping through) is O(1)
    probe = jnp.asarray(np.array([0.31, -0.22, 0.17, -0.4]), v0.dtype)
    exact = np.asarray(_norm_map(probe), np.float64)
    affine = c_n + J @ np.asarray(probe, np.float64)
    tol = 1e4 * float(np.finfo(np.asarray(v0).dtype).eps)
    if not np.allclose(exact, affine, rtol=tol, atol=tol):
        raise ValueError("PMSM current subsystem is not affine at this config")

    # ---- stationary Kalman gain (2x2, C = I on the noisy current cols) --
    pnoise = dict(model._process_noise or {})
    if process_std:
        pnoise.update(process_std)
    mnoise = dict(model._observation_noise or {})
    if measurement_std:
        mnoise.update(measurement_std)
    if not ("i_d" in mnoise and "i_q" in mnoise):
        raise ValueError(
            "the observer needs current-sensor noise levels: configure "
            "observation_noise={'i_d': ..., 'i_q': ...} on the model or "
            "pass measurement_std"
        )
    s_d = 2.0 / (spans["i_d"][1] - spans["i_d"][0])
    s_q = 2.0 / (spans["i_q"][1] - spans["i_q"][0])
    Q = np.diag(
        [
            (s_d * pnoise.get("i_d", 0.0) * np.sqrt(tau)) ** 2 + q_floor,
            (s_q * pnoise.get("i_q", 0.0) * np.sqrt(tau)) ** 2 + q_floor,
        ]
    )
    R = np.diag([(s_d * mnoise["i_d"]) ** 2, (s_q * mnoise["i_q"]) ** 2])
    P = Q.copy()
    converged = False
    for _ in range(200_000):
        S = P + R
        Kp = P @ np.linalg.inv(S)
        P_next = A_n @ (P - Kp @ P) @ A_n.T + Q
        if np.max(np.abs(P_next - P)) < 1e-14:
            P = P_next
            converged = True
            break
        P = P_next
    if not converged:
        # a non-contracting Q/R configuration must not silently yield a
        # non-stationary gain — the whole premise of the constant-K tile
        raise ValueError(
            "stationary Riccati iteration did not converge to 1e-14 in "
            "200000 steps — the Q/R configuration does not admit a "
            "stationary Kalman gain (check process/measurement noise "
            "levels and q_floor)"
        )
    K = P @ np.linalg.inv(P + R)
    K = [[float(v) for v in row] for row in K]
    A_l = [[float(v) for v in row] for row in A_n]
    B_l = [[float(v) for v in row] for row in B_n]
    c_l = [float(v) for v in c_n]

    # ---- PI current law on the belief -----------------------------------
    kp_d = 2000.0 * l_d if kp_d is None else kp_d
    kp_q = 2000.0 * l_q if kp_q is None else kp_q
    ki_d = kp_d / 5e-3 if ki_d is None else ki_d
    ki_q = kp_q / 5e-3 if ki_q is None else ki_q
    u_max_d = min(abs(aspans["u_d"][0]), abs(aspans["u_d"][1]))
    u_max_q = min(abs(aspans["u_q"][0]), abs(aspans["u_q"][1]))
    # hexagon inscribed circle: |u_dq| <= u_dc / sqrt(3) keeps the inverter
    # constraint inactive (command == applied voltage)
    u_lim = min(u_max_d, u_max_q, float(u_dc) / float(np.sqrt(3.0)))
    i_d_ref, i_q_ref = float(i_d_ref), float(i_q_ref)
    (mn_d, mx_d), (mn_q, mx_q) = spans["i_d"], spans["i_q"]
    (amn_d, amx_d), (amn_q, amx_q) = aspans["u_d"], aspans["u_q"]

    def policy_tile(obs, t, carry):
        xh_d, xh_q, int_d, int_q = carry[:4]
        # assimilate the noisy normalized current measurements
        in_d = obs[0] - xh_d
        in_q = obs[1] - xh_q
        xc_d = xh_d + K[0][0] * in_d + K[0][1] * in_q
        xc_q = xh_q + K[1][0] * in_d + K[1][1] * in_q
        i_d = (xc_d + 1.0) / 2.0 * (mx_d - mn_d) + mn_d
        i_q = (xc_q + 1.0) / 2.0 * (mx_q - mn_q) + mn_q
        # decoupled PI on the BELIEF: resistive drop at the setpoint, speed
        # cross-terms on the estimated currents
        e_d = i_d_ref - i_d
        e_q = i_q_ref - i_q
        u_d_unsat = kp_d * e_d + int_d + r_s * i_d_ref - omega_el * l_q * i_q
        u_q_unsat = kp_q * e_q + int_q + r_s * i_q_ref + omega_el * (l_d * i_d + psi_p)
        u_mag = jnp.sqrt(u_d_unsat**2 + u_q_unsat**2)
        scale = jnp.minimum(1.0, u_lim / jnp.maximum(u_mag, 1e-9))
        u_d = u_d_unsat * scale
        u_q = u_q_unsat * scale
        int_d1 = int_d + ki_d * tau * e_d + (tau * ki_d / kp_d) * (u_d - u_d_unsat)
        int_q1 = int_q + ki_q * tau * e_q + (tau * ki_q / kp_q) * (u_q - u_q_unsat)
        a_d = 2.0 * (u_d - amn_d) / (amx_d - amn_d) - 1.0
        a_q = 2.0 * (u_q - amn_q) / (amx_q - amn_q) - 1.0
        if deadtime:
            # the voltage applied THIS step is the previous command; the
            # fresh command enters the carried delay slot
            ap_d, ap_q = carry[4], carry[5]
        else:
            ap_d, ap_q = a_d, a_q
        xn_d = (
            c_l[0]
            + A_l[0][0] * xc_d + A_l[0][1] * xc_q
            + B_l[0][0] * ap_d + B_l[0][1] * ap_q
        )
        xn_q = (
            c_l[1]
            + A_l[1][0] * xc_d + A_l[1][1] * xc_q
            + B_l[1][0] * ap_d + B_l[1][1] * ap_q
        )
        new_carry = (xn_d, xn_q, int_d1, int_q1)
        if deadtime:
            new_carry = new_carry + (a_d, a_q)
        return (a_d, a_q), new_carry

    B = model.batch_size
    # initial belief: the normalized reset currents (mid-band); initial
    # delayed command: the reset buffer's 0 V, normalized
    x0_d = float(2.0 * (0.0 - mn_d) / (mx_d - mn_d) - 1.0)
    x0_q = float(2.0 * (0.0 - mn_q) / (mx_q - mn_q) - 1.0)
    carry0 = (
        jnp.full((B,), x0_d), jnp.full((B,), x0_q),
        jnp.zeros((B,)), jnp.zeros((B,)),
    )
    if deadtime:
        a0_d = float(2.0 * (0.0 - amn_d) / (amx_d - amn_d) - 1.0)
        a0_q = float(2.0 * (0.0 - amn_q) / (amx_q - amn_q) - 1.0)
        carry0 = carry0 + (jnp.full((B,), a0_d), jnp.full((B,), a0_q))
    return policy_tile, carry0


def make_pmsm_saturated_sensorless_current_tile(
    model,
    *,
    i_d_ref: float,
    i_q_ref: float,
    omega_el: float = None,
    bandwidth: float = 2000.0,
    t_i: float = 5e-3,
    process_std: dict = None,
    measurement_std: dict = None,
    q_floor: float = 1e-6,
    riccati_tol: float = 1e-13,
):
    """GAIN-SCHEDULED sensorless current control of the SATURATED (LUT
    magnetics) PMSM drive fully inside the fused closed-loop kernel — the
    extension :func:`make_pmsm_sensorless_current_tile`'s refusal names.

    With LUT magnetics the differential-inductance matrix varies >3x over
    the operating range (BRUSA map), so no single stationary Kalman gain is
    uniformly correct.  The principled fix is a gain SCHEDULE: at every
    point of the drive's own LUT grid this builder linearizes the
    discrete-time current subsystem (one normalized solver step through the
    differentiable :func:`~exciting_environments_tpu.ops.lut.
    bilinear_gather`, ``jax.jacobian`` per grid point) and solves the
    per-point stationary Riccati equation, yielding four Kalman-gain maps
    ``K(i_d, i_q)`` on the SAME grid as the magnetics.  The closed-loop
    kernel gathers them — stacked with the six magnetics channels — at the
    DENORMALIZED belief currents each step via the exact one-hot MXU
    contraction (:class:`~exciting_environments_tpu.ops.pallas.
    pmsm_stepper.ScheduledLUT`; one extra 10-channel gather per step
    alongside the plant's own 6-channel gather), so the observer re-tunes
    itself to the operating point with zero host involvement: the
    per-step relinearization of the host EKF collapses to a table lookup.

    The per-step tile (all elementwise on VMEM tiles):

    1. assimilate the NOISY normalized current measurements with the
       gathered gains: ``x+ = x- + K(x-) innov``;
    2. gain-scheduled PI on the belief: ``kp = bandwidth * L_dd(x-)`` /
       ``bandwidth * L_qq(x-)`` (constant-bandwidth schedule — the loop
       gain tracks the saturation-dependent plant gain), decoupling
       feedforward from the gathered FLUX maps (``-omega Psi_q(x-)`` /
       ``+omega Psi_d(x-)`` — the true saturated back-EMF, not the linear
       ``l_q i_q`` surrogate), back-calculation anti-windup;
    3. vector limit to the hexagon's inscribed circle ``u_dc/sqrt(3)``
       (constraint provably inactive → the observer's predicted voltage IS
       the applied voltage), deadtime handled by carrying the delayed
       command;
    4. predict with the drive's OWN nonlinear model: one Euler step of the
       saturated ODE using the gathered inductance/flux channels
       (closed-form 2x2 inverse — the exact ``PMSM.nonlinear_ode``
       expressions) at the applied voltage.

    The channels are gathered at the PRE-correction belief ``x-`` and used
    at the post-correction ``x+`` — a second-order approximation (the
    correction is sensor-noise-sized and the maps vary smoothly); the
    alternative (a second gather at ``x+``) would double the observer's
    gather cost for a sub-percent gain-accuracy change.

    Args:
        model: a SATURATED :class:`PMSM` (LUT magnetics) with scalar
            properties, ``deadtime`` in {0, 1}, a one-stage solver (the
            Euler default — the predict model is an Euler step), and
            current-sensor noise configured
            (``observation_noise={'i_d': ..., 'i_q': ...}`` or
            ``measurement_std``).
        i_d_ref / i_q_ref: current setpoints [A], Python scalars.
        omega_el: frozen electrical speed [rad/s] the fleet runs at
            (default: the mid-band speed ``init_state`` resets to).
        bandwidth: current-loop bandwidth [rad/s] of the constant-bandwidth
            gain schedule (``kp = bandwidth * L_diff(belief)``).
        t_i: PI integral time [s] (``ki = kp / t_i``).
        process_std / measurement_std: per-field overrides of the env's
            noise config for the observer's Q/R [physical units].
        q_floor: diagonal process-covariance floor (normalized units^2) —
            see :func:`make_pmsm_sensorless_current_tile`.
        riccati_tol: per-grid-point fixed-point tolerance.

    Returns:
        ``(policy_tile, carry0, sched_lut)`` — pass ALL three to the
        closed loop: ``env.fused_closed_loop(state, policy_tile, n,
        policy_carry=carry0, sched_lut=sched_lut)``; the identical tile
        rides ``tile_policy_scan(..., sched_lut=sched_lut)`` on the CPU
        backend.  The carry is the 2 normalized belief planes, the 2 PI
        integrators [V] and (deadtime only) the 2 previous normalized
        commands; ``sched_lut.carry_idx == (0, 1)``.
    """
    import jax

    from exciting_environments_tpu.ops.lut import bilinear_gather
    from exciting_environments_tpu.ops.pallas.pmsm_stepper import ScheduledLUT

    props = model.env_properties
    if not bool(props.saturated) or model._lut is None:
        raise ValueError(
            "make_pmsm_saturated_sensorless_current_tile covers the "
            "LUT-magnetics drive; for linear magnetics use "
            "make_pmsm_sensorless_current_tile (one exact stationary gain, "
            "no gather needed)"
        )
    if not model._solver.one_stage:
        raise ValueError(
            "the gain schedule's per-point linearization and the tile's "
            "in-kernel predict are one Euler step of the saturated ODE — "
            "construct the drive with the one-stage default solver"
        )

    def _scalar(name):
        v = np.asarray(getattr(props.static_params, name))
        if v.ndim != 0:
            raise ValueError(
                f"make_pmsm_saturated_sensorless_current_tile needs scalar "
                f"static params; {name} has shape {v.shape}"
            )
        return float(v)

    r_s = _scalar("r_s")
    u_dc = _scalar("u_dc")
    deadtime = int(_scalar("deadtime"))
    if deadtime not in (0, 1):
        raise ValueError("deadtime must be 0 or 1")
    tau = float(model.tau)
    lut = model._lut
    lut_vals = jnp.asarray(lut.values)

    pn = props.physical_normalizations
    try:
        spans = {
            n: (float(getattr(pn, n).min), float(getattr(pn, n).max))
            for n in ("i_d", "i_q", "omega_el")
        }
        an = props.action_normalizations
        aspans = {
            n: (float(getattr(an, n).min), float(getattr(an, n).max))
            for n in ("u_d", "u_q")
        }
    except TypeError as e:
        raise ValueError(
            "make_pmsm_saturated_sensorless_current_tile needs scalar "
            "normalizations (the tile folds them into the program)"
        ) from e

    if omega_el is None:
        omega_el = 0.5 * (spans["omega_el"][0] + spans["omega_el"][1])
    omega_el = float(omega_el)

    # ---- per-grid-point linearization + stationary Riccati ---------------
    # one normalized Euler step of the saturated current subsystem at
    # frozen speed; the Jacobian (through the piecewise-bilinear LUT maps)
    # is voltage-independent, so u = 0 w.l.o.g.
    (mn_d, mx_d), (mn_q, mx_q) = spans["i_d"], spans["i_q"]

    def _phys_f(i_d, i_q, u_d, u_q):
        vals = bilinear_gather(
            lut_vals, lut.x0, lut.dx, lut.y0, lut.dy, lut.nx, lut.ny, i_d, i_q
        )
        l_dd, l_dq, l_qd, l_qq, psi_d, psi_q = (vals[c] for c in range(6))
        det = l_dd * l_qq - l_dq * l_qd
        inv_dd, inv_dq = l_qq / det, -l_dq / det
        inv_qd, inv_qq = -l_qd / det, l_dd / det
        rhs_d = u_d - r_s * i_d + omega_el * psi_q
        rhs_q = u_q - r_s * i_q - omega_el * psi_d
        return (inv_dd * rhs_d + inv_dq * rhs_q, inv_qd * rhs_d + inv_qq * rhs_q)

    def _norm_step(xn):
        i_d = (xn[0] + 1.0) / 2.0 * (mx_d - mn_d) + mn_d
        i_q = (xn[1] + 1.0) / 2.0 * (mx_q - mn_q) + mn_q
        f_d, f_q = _phys_f(i_d, i_q, 0.0, 0.0)
        i_d1 = i_d + tau * f_d
        i_q1 = i_q + tau * f_q
        return jnp.stack(
            [
                2.0 * (i_d1 - mn_d) / (mx_d - mn_d) - 1.0,
                2.0 * (i_q1 - mn_q) / (mx_q - mn_q) - 1.0,
            ]
        )

    gx = np.asarray(lut.x0) + np.asarray(lut.dx) * np.arange(lut.nx)
    gy = np.asarray(lut.y0) + np.asarray(lut.dy) * np.arange(lut.ny)
    gdn = 2.0 * (gx - mn_d) / (mx_d - mn_d) - 1.0
    gqn = 2.0 * (gy - mn_q) / (mx_q - mn_q) - 1.0
    pts = np.stack(
        [np.repeat(gdn, lut.ny), np.tile(gqn, lut.nx)], axis=-1
    )  # (nx*ny, 2), x-major like values[:, ix, iy]
    A = np.asarray(
        jax.vmap(jax.jacobian(_norm_step))(jnp.asarray(pts)), np.float64
    )  # (N, 2, 2)

    pnoise = dict(model._process_noise or {})
    if process_std:
        pnoise.update(process_std)
    mnoise = dict(model._observation_noise or {})
    if measurement_std:
        mnoise.update(measurement_std)
    if not ("i_d" in mnoise and "i_q" in mnoise):
        raise ValueError(
            "the observer needs current-sensor noise levels: configure "
            "observation_noise={'i_d': ..., 'i_q': ...} on the model or "
            "pass measurement_std"
        )
    s_d = 2.0 / (mx_d - mn_d)
    s_q = 2.0 / (mx_q - mn_q)
    Q = np.diag(
        [
            (s_d * pnoise.get("i_d", 0.0) * np.sqrt(tau)) ** 2 + q_floor,
            (s_q * pnoise.get("i_q", 0.0) * np.sqrt(tau)) ** 2 + q_floor,
        ]
    )
    R = np.diag([(s_d * mnoise["i_d"]) ** 2, (s_q * mnoise["i_q"]) ** 2])

    def _inv2(M):
        a, b = M[:, 0, 0], M[:, 0, 1]
        c, d = M[:, 1, 0], M[:, 1, 1]
        det = a * d - b * c
        out = np.empty_like(M)
        out[:, 0, 0] = d / det
        out[:, 0, 1] = -b / det
        out[:, 1, 0] = -c / det
        out[:, 1, 1] = a / det
        return out

    N = A.shape[0]
    At = np.transpose(A, (0, 2, 1))
    P = np.broadcast_to(Q, (N, 2, 2)).copy()
    converged = False
    for _ in range(200_000):
        Kp = P @ _inv2(P + R[None])
        P_next = A @ (P - Kp @ P) @ At + Q
        if np.max(np.abs(P_next - P)) < riccati_tol:
            P = P_next
            converged = True
            break
        P = P_next
    if not converged:
        raise ValueError(
            "per-grid-point stationary Riccati iteration did not converge — "
            "the Q/R configuration does not admit stationary gains on this "
            "operating range (check noise levels and q_floor)"
        )
    K = P @ _inv2(P + R[None])  # (N, 2, 2), normalized-coordinate gains
    k_maps = K.reshape(lut.nx, lut.ny, 2, 2).transpose(2, 3, 0, 1).reshape(
        4, lut.nx, lut.ny
    )  # channels K00, K01, K10, K11

    # gathered channel stack: the six magnetics maps + the four gain maps
    sched_vals = np.concatenate([np.asarray(lut.values), k_maps], axis=0)
    sched_lut = ScheduledLUT(sched_vals, carry_idx=(0, 1))

    # ---- the tile --------------------------------------------------------
    u_max_d = min(abs(aspans["u_d"][0]), abs(aspans["u_d"][1]))
    u_max_q = min(abs(aspans["u_q"][0]), abs(aspans["u_q"][1]))
    u_lim = min(u_max_d, u_max_q, float(u_dc) / float(np.sqrt(3.0)))
    i_d_ref, i_q_ref = float(i_d_ref), float(i_q_ref)
    (amn_d, amx_d), (amn_q, amx_q) = aspans["u_d"], aspans["u_q"]
    bandwidth = float(bandwidth)
    t_i = float(t_i)
    n_base = 8 + len(model.control_state)  # std obs cols + tracked refs

    def policy_tile(obs, t, carry):
        xh_d, xh_q, int_d, int_q = carry[:4]
        (l_dd, l_dq, l_qd, l_qq, psi_d, psi_q,
         k00, k01, k10, k11) = obs[n_base : n_base + 10]
        # 1. assimilate with the operating-point gains
        in_d = obs[0] - xh_d
        in_q = obs[1] - xh_q
        xc_d = xh_d + k00 * in_d + k01 * in_q
        xc_q = xh_q + k10 * in_d + k11 * in_q
        i_d = (xc_d + 1.0) / 2.0 * (mx_d - mn_d) + mn_d
        i_q = (xc_q + 1.0) / 2.0 * (mx_q - mn_q) + mn_q
        # 2. constant-bandwidth PI with the saturated back-EMF feedforward
        kp_d = bandwidth * l_dd
        kp_q = bandwidth * l_qq
        ki_d = kp_d / t_i
        ki_q = kp_q / t_i
        e_d = i_d_ref - i_d
        e_q = i_q_ref - i_q
        u_d_unsat = kp_d * e_d + int_d + r_s * i_d_ref - omega_el * psi_q
        u_q_unsat = kp_q * e_q + int_q + r_s * i_q_ref + omega_el * psi_d
        # 3. inscribed-circle vector limit + back-calculation anti-windup
        u_mag = jnp.sqrt(u_d_unsat**2 + u_q_unsat**2)
        scale = jnp.minimum(1.0, u_lim / jnp.maximum(u_mag, 1e-9))
        u_d = u_d_unsat * scale
        u_q = u_q_unsat * scale
        int_d1 = int_d + ki_d * tau * e_d + (tau / t_i) * (u_d - u_d_unsat)
        int_q1 = int_q + ki_q * tau * e_q + (tau / t_i) * (u_q - u_q_unsat)
        a_d = 2.0 * (u_d - amn_d) / (amx_d - amn_d) - 1.0
        a_q = 2.0 * (u_q - amn_q) / (amx_q - amn_q) - 1.0
        if deadtime:
            ap_d, ap_q = carry[4], carry[5]
        else:
            ap_d, ap_q = a_d, a_q
        # 4. predict: one Euler step of the saturated ODE with the gathered
        # channels at the applied (inscribed-circle, hence unconstrained)
        # voltage
        u_ap_d = (ap_d + 1.0) / 2.0 * (amx_d - amn_d) + amn_d
        u_ap_q = (ap_q + 1.0) / 2.0 * (amx_q - amn_q) + amn_q
        det = l_dd * l_qq - l_dq * l_qd
        inv_dd, inv_dq = l_qq / det, -l_dq / det
        inv_qd, inv_qq = -l_qd / det, l_dd / det
        rhs_d = u_ap_d - r_s * i_d + omega_el * psi_q
        rhs_q = u_ap_q - r_s * i_q - omega_el * psi_d
        i_d1 = i_d + tau * (inv_dd * rhs_d + inv_dq * rhs_q)
        i_q1 = i_q + tau * (inv_qd * rhs_d + inv_qq * rhs_q)
        xn_d = 2.0 * (i_d1 - mn_d) / (mx_d - mn_d) - 1.0
        xn_q = 2.0 * (i_q1 - mn_q) / (mx_q - mn_q) - 1.0
        new_carry = (xn_d, xn_q, int_d1, int_q1)
        if deadtime:
            new_carry = new_carry + (a_d, a_q)
        return (a_d, a_q), new_carry

    B = model.batch_size
    x0_d = float(2.0 * (0.0 - mn_d) / (mx_d - mn_d) - 1.0)
    x0_q = float(2.0 * (0.0 - mn_q) / (mx_q - mn_q) - 1.0)
    carry0 = (
        jnp.full((B,), x0_d), jnp.full((B,), x0_q),
        jnp.zeros((B,)), jnp.zeros((B,)),
    )
    if deadtime:
        a0_d = float(2.0 * (0.0 - amn_d) / (amx_d - amn_d) - 1.0)
        a0_q = float(2.0 * (0.0 - amn_q) / (amx_q - amn_q) - 1.0)
        carry0 = carry0 + (jnp.full((B,), a0_d), jnp.full((B,), a0_q))
    return policy_tile, carry0, sched_lut
