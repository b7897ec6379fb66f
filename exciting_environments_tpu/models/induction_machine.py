"""Squirrel-cage induction machine, stationary-frame dq model
(beyond-reference environment).

Not in the reference suite — the induction machine is the industrial
workhorse the "exciting" excitation/identification workflows exist for, and
here it doubles as the drive-flavored showcase of the declarative engine:
unlike the PMSM (which needs its own inverter-constraint/deadtime step
override and LUT kernels), the SCIM's current/flux dynamics at frozen rotor
speed are a plain linear ODE, so the whole environment is a
:class:`~exciting_environments_tpu.core.classic.ClassicODEEnvironment`
subclass — and every engine feature applies with no further code: vmap
batching, per-batch heterogeneous parameters (e.g. a rotor-resistance
temperature sweep), the generic fused Pallas rollout kernel, stochastic
simulation (current-sensor noise), EKF/UKF rotor-FLUX observers (the
classic sensorless-drive problem: :math:`\\psi_r` is not measurable),
iLQR/MPPI planning, mesh sharding and all wrappers.

Model (stationary alpha/beta frame, amplitude-invariant, electrical rotor
speed :math:`\\omega_r = p\\,\\omega_{mech}` frozen along a rollout — the
same quasi-static separation of the electrical subsystem the reference's
PMSM makes, ``/root/reference/exciting_environments/pmsm/pmsm_env.py:509-523``):

.. math::
    \\sigma = 1 - \\frac{L_m^2}{L_s L_r},\\qquad
    \\tau_r = \\frac{L_r}{R_r},\\qquad
    R_\\sigma = R_s + \\frac{L_m^2 R_r}{L_r^2}

.. math::
    \\dot i_{s}    &= \\frac{1}{\\sigma L_s}\\Big(u_s - R_\\sigma i_s
                     + \\frac{L_m R_r}{L_r^2}\\psi_r
                     - j\\,\\omega_r \\frac{L_m}{L_r}\\psi_r\\Big) \\\\
    \\dot \\psi_r  &= \\frac{R_r}{L_r}\\big(L_m i_s - \\psi_r\\big)
                     + j\\,\\omega_r \\psi_r

written out in real d/q components below (TPU-native: no complex arrays).
Torque is the derived bilinear form
:math:`T = \\tfrac{3}{2} p \\tfrac{L_m}{L_r}(\\psi_{rd} i_{sq} - \\psi_{rq} i_{sd})`
(:meth:`InductionMachine.torque`).

Default parameters model a small industrial 2-pole-pair machine
(R_s = 2.9 Ohm, R_r = 2.3 Ohm, L_m = 225 mH, L_s = L_r = 236 mH): leakage
factor sigma ~ 0.091, stator transient time constant ~4.3 ms, rotor time
constant ~103 ms — comfortably stable under the default Euler at
tau = 1e-4 up to the +-450 rad/s electrical-speed band.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from exciting_environments_tpu.core.classic import ClassicODEEnvironment
from exciting_environments_tpu.core.structures import pytree_dataclass
from exciting_environments_tpu.utils import MinMaxNormalization


class InductionMachine(ClassicODEEnvironment):
    """
    State Variables:
        ``['i_sd', 'i_sq', 'psi_rd', 'psi_rq']`` — stator currents and rotor
        flux linkages in the stationary dq (alpha/beta) frame.

    Action Variables:
        ``['u_sd', 'u_sq']`` — stator voltages in the same frame.

    Initial State:
        Unless chosen otherwise, all zeros (machine at standstill flux).

    Dynamics (``omega`` = electrical rotor speed, frozen static param):
        ``d_i_sd   = (u_sd - R_sig*i_sd + k_r*(R_r/L_r)*psi_rd + omega*k_r*psi_rq) / (sigma*L_s)``
        ``d_i_sq   = (u_sq - R_sig*i_sq + k_r*(R_r/L_r)*psi_rq - omega*k_r*psi_rd) / (sigma*L_s)``
        ``d_psi_rd = (R_r/L_r)*(L_m*i_sd - psi_rd) - omega*psi_rq``
        ``d_psi_rq = (R_r/L_r)*(L_m*i_sq - psi_rq) + omega*psi_rd``
        with ``k_r = L_m/L_r``, ``R_sig = r_s + k_r^2 * r_r``.

    The rotor flux is not measurable on a real machine — reconstructing it
    from current measurements is the canonical observer problem; the EKF/UKF
    of :mod:`~exciting_environments_tpu.utils.estimate` solve it out of the
    box (``measured_fields=("i_sd", "i_sq")``).
    """

    _default_batch_size = 8
    _default_tau = 1e-4

    def __init__(self, *args, u_dc: float = None, **kwargs):
        """All :class:`ClassicODEEnvironment` constructor args, plus:

        Args:
            u_dc: optional DC-link voltage [V] enabling INVERTER REALISM on
                the stator voltage pair: the physical ``(u_sd, u_sq)``
                command is vector-limited to the hexagon's inscribed circle
                ``|u_s| <= u_dc / sqrt(3)`` — the space-vector-modulation
                linear region, rotation-invariant and therefore exact
                without an electrical-angle state (the same argument as the
                EESM's stator limit, :class:`~exciting_environments_tpu.
                models.eesm.EESM`; the PMSM, which carries ``epsilon``,
                implements the full rotating hexagon).  Applied identically
                on every path — step / sim_ahead / rewards / adaptive /
                fused open-loop slabs / closed-loop kernels — via the
                engine's state-independent action-constraint hook.  Default
                ``None``: no constraint, pinned defaults and golden
                behavior untouched.
        """
        super().__init__(*args, **kwargs)
        if u_dc is not None:
            self._u_dc = float(u_dc)
            lim = self._u_dc / float(np.sqrt(3.0))

            def _svm_circle(comps):
                u_sd, u_sq = comps
                mag = jnp.sqrt(u_sd * u_sd + u_sq * u_sq)
                scale = jnp.minimum(1.0, lim / jnp.maximum(mag, 1e-12))
                return (u_sd * scale, u_sq * scale)

            self._constrain_action_tuple = _svm_circle

    _ode_state_fields = ("i_sd", "i_sq", "psi_rd", "psi_rq")
    _angle_fields = ()
    _sincos_reward_fields = ()
    _soft_constrained_fields = ("i_sd", "i_sq", "psi_rd", "psi_rq")
    _default_init_norm = {"i_sd": 0.0, "i_sq": 0.0, "psi_rd": 0.0, "psi_rq": 0.0}

    @classmethod
    def _default_physical_normalizations(cls):
        return {
            "i_sd": MinMaxNormalization(min=-20.0, max=20.0),
            "i_sq": MinMaxNormalization(min=-20.0, max=20.0),
            "psi_rd": MinMaxNormalization(min=-1.5, max=1.5),
            "psi_rq": MinMaxNormalization(min=-1.5, max=1.5),
        }

    @classmethod
    def _default_action_normalizations(cls):
        # one inverter-leg amplitude per axis (400 V DC link, ~325 V peak phase)
        return {
            "u_sd": MinMaxNormalization(min=-325.0, max=325.0),
            "u_sq": MinMaxNormalization(min=-325.0, max=325.0),
        }

    @classmethod
    def _default_static_params(cls):
        return {
            "r_s": 2.9,
            "r_r": 2.3,
            "l_m": 0.225,
            "l_s": 0.236,
            "l_r": 0.236,
            "p": 2.0,
            "omega": 2.0 * 3.141592653589793 * 48.0,  # electrical rad/s, frozen
        }

    @pytree_dataclass
    class PhysicalState:
        """Physical state of the machine."""

        i_sd: jax.Array
        i_sq: jax.Array
        psi_rd: jax.Array
        psi_rq: jax.Array

    @pytree_dataclass
    class Additions:
        """Solver carry threaded between steps."""

        solver_state: tuple
        active_solver_state: bool

    @pytree_dataclass
    class StaticParams:
        """Electrical parameters (``omega`` = frozen electrical rotor speed)."""

        r_s: jax.Array
        r_r: jax.Array
        l_m: jax.Array
        l_s: jax.Array
        l_r: jax.Array
        p: jax.Array
        omega: jax.Array

    @pytree_dataclass
    class Action:
        """Stator voltage command in the stationary dq frame."""

        u_sd: jax.Array
        u_sq: jax.Array

    def _ode(self, t, y, args, action):
        i_sd, i_sq, psi_rd, psi_rq = y
        params = args
        u = action(t)
        k_r = params.l_m / params.l_r
        r_over_l = params.r_r / params.l_r
        sigma_l_s = params.l_s - params.l_m * k_r  # sigma * L_s
        r_sig = params.r_s + k_r * k_r * params.r_r
        d_i_sd = (
            u[0] - r_sig * i_sd + k_r * (r_over_l * psi_rd + params.omega * psi_rq)
        ) / sigma_l_s
        d_i_sq = (
            u[1] - r_sig * i_sq + k_r * (r_over_l * psi_rq - params.omega * psi_rd)
        ) / sigma_l_s
        d_psi_rd = r_over_l * (params.l_m * i_sd - psi_rd) - params.omega * psi_rq
        d_psi_rq = r_over_l * (params.l_m * i_sq - psi_rq) + params.omega * psi_rd
        return d_i_sd, d_i_sq, d_psi_rd, d_psi_rq

    def torque(self, state, env_properties=None):
        """Electromagnetic torque of (a batch of) states:
        ``1.5 p (L_m/L_r) (psi_rd i_sq - psi_rq i_sd)``."""
        params = (env_properties or self.env_properties).static_params
        phys = state.physical_state
        return (
            1.5
            * params.p
            * (params.l_m / params.l_r)
            * (phys.psi_rd * phys.i_sq - phys.psi_rq * phys.i_sd)
        )
