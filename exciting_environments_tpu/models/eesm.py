"""Externally excited synchronous machine (EESM), rotor-frame dq model
(beyond-reference environment).

Not in the reference suite — the wound-rotor synchronous machine is the
magnet-free traction drive (no rare-earth magnets; the rotor field is an
actively controlled third input), and here it completes the drive family
triangle next to the PMSM (permanent magnets, LUT saturation, own kernels)
and the :class:`~exciting_environments_tpu.models.induction_machine
.InductionMachine` (induced rotor currents): three electrical machines,
three excitation mechanisms, one declarative engine. Like the SCIM, the
EESM at frozen electrical speed is a plain linear ODE, so the whole
environment is a
:class:`~exciting_environments_tpu.core.classic.ClassicODEEnvironment`
subclass and every engine feature applies with no further code: vmap
batching, per-batch heterogeneous parameters, the generic fused Pallas
rollout kernel, stochastic simulation, EKF/UKF observers and the
stationary Kalman gain (the model is verified-linear), iLQR/MPPI planning,
mesh sharding and all wrappers.

Model (rotor dq reference frame, amplitude-invariant, field winding
referred to the stator so the mutual coupling is symmetric; electrical
rotor speed :math:`\\omega_{el}` frozen along a rollout — the same
quasi-static separation of the electrical subsystem the reference's PMSM
makes, ``/root/reference/exciting_environments/pmsm/pmsm_env.py:509-523``):

.. math::
    \\psi_d = L_d i_d + L_m i_f,\\qquad
    \\psi_q = L_q i_q,\\qquad
    \\psi_f = L_f i_f + L_m i_d

.. math::
    \\dot\\psi_d &= u_d - R_s i_d + \\omega_{el}\\,\\psi_q \\\\
    \\dot\\psi_q &= u_q - R_s i_q - \\omega_{el}\\,\\psi_d \\\\
    \\dot\\psi_f &= u_f - R_f i_f

inverted through the constant inductance matrix
:math:`L = \\begin{pmatrix} L_d & 0 & L_m \\\\ 0 & L_q & 0 \\\\
L_m & 0 & L_f \\end{pmatrix}` analytically (2x2 d/f block determinant
:math:`D = L_d L_f - L_m^2`), so the currents are the integrated state.
Torque is the derived bilinear form
:math:`T = \\tfrac{3}{2} p\\,(\\psi_d i_q - \\psi_q i_d)
= \\tfrac{3}{2} p\\,(L_m i_f i_q + (L_d - L_q)\\, i_d i_q)` — excitation
torque plus reluctance torque (:meth:`EESM.torque`).

Default parameters model a small salient wound-rotor machine
(R_s = 0.25 Ohm, R_f = 2.0 Ohm, L_d = 3 mH, L_q = 4 mH, L_f = 120 mH,
L_m = 15 mH): coupling determinant D = 1.35e-4 H^2, transient stator
time constant sigma·L_d/R_s ~ 4.5 ms, field time constant
sigma·L_f/R_f ~ 22.5 ms — comfortably stable under the default Euler at
tau = 1e-4 across the +-450 rad/s electrical-speed band.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from exciting_environments_tpu.core.classic import ClassicODEEnvironment
from exciting_environments_tpu.core.structures import pytree_dataclass
from exciting_environments_tpu.utils import MinMaxNormalization


class EESM(ClassicODEEnvironment):
    """
    State Variables:
        ``['i_d', 'i_q', 'i_f']`` — stator currents in the rotor dq frame
        and the (stator-referred) field-winding current.

    Action Variables:
        ``['u_d', 'u_q', 'u_f']`` — stator dq voltages and the field
        voltage: three independent inputs (the PMSM/SCIM have two).

    Initial State:
        Unless chosen otherwise, all zeros (machine de-energized).

    Dynamics (``omega_el`` = electrical rotor speed, frozen static param;
    ``D = l_d*l_f - l_m**2``):
        ``p_d   = u_d - r_s*i_d + omega_el*l_q*i_q``
        ``p_q   = u_q - r_s*i_q - omega_el*(l_d*i_d + l_m*i_f)``
        ``p_f   = u_f - r_f*i_f``
        ``d_i_d = (l_f*p_d - l_m*p_f) / D``
        ``d_i_q = p_q / l_q``
        ``d_i_f = (l_d*p_f - l_m*p_d) / D``

    The d-axis and field windings are magnetically coupled (transformer
    action through ``l_m``): a field-voltage step induces a transient
    d-current and vice versa — the cross-coupling that makes EESM current
    control harder than PMSM control, and this environment a meaningful
    benchmark for it.
    """

    _default_batch_size = 8
    _default_tau = 1e-4

    def __init__(self, *args, u_dc: float = None, **kwargs):
        """All :class:`ClassicODEEnvironment` constructor args, plus:

        Args:
            u_dc: optional DC-link voltage [V] enabling INVERTER REALISM on
                the stator pair: the physical ``(u_d, u_q)`` command is
                vector-limited to the hexagon's inscribed circle
                ``|u_dq| <= u_dc / sqrt(3)`` — the space-vector-modulation
                linear region, which is rotation-invariant and therefore
                exact without an electrical-angle state (the full hexagon's
                corners rotate with the angle; reaching them means
                overmodulation, outside this model's scope — the PMSM,
                which carries ``epsilon`` as a state, implements the full
                rotating hexagon).  Applied identically on every path
                (step / sim_ahead / rewards / adaptive / fused open-loop
                slabs / closed-loop kernels) via the engine's
                state-independent action-constraint hook; the field
                chopper's ``u_f`` is per-axis limited by its own action
                band as before.  Default ``None``: no constraint, the
                pinned defaults and golden behavior are untouched.
        """
        super().__init__(*args, **kwargs)
        if u_dc is not None:
            self._u_dc = float(u_dc)
            lim = self._u_dc / float(np.sqrt(3.0))

            def _svm_circle(comps):
                u_d, u_q, u_f = comps
                mag = jnp.sqrt(u_d * u_d + u_q * u_q)
                scale = jnp.minimum(1.0, lim / jnp.maximum(mag, 1e-12))
                return (u_d * scale, u_q * scale, u_f)

            self._constrain_action_tuple = _svm_circle

    _ode_state_fields = ("i_d", "i_q", "i_f")
    _angle_fields = ()
    _sincos_reward_fields = ()
    _soft_constrained_fields = ("i_d", "i_q", "i_f")
    _default_init_norm = {"i_d": 0.0, "i_q": 0.0, "i_f": 0.0}

    @classmethod
    def _default_physical_normalizations(cls):
        return {
            "i_d": MinMaxNormalization(min=-20.0, max=20.0),
            "i_q": MinMaxNormalization(min=-20.0, max=20.0),
            "i_f": MinMaxNormalization(min=-20.0, max=20.0),
        }

    @classmethod
    def _default_action_normalizations(cls):
        # stator legs off a 400 V DC link (~325 V peak phase); field chopper
        return {
            "u_d": MinMaxNormalization(min=-325.0, max=325.0),
            "u_q": MinMaxNormalization(min=-325.0, max=325.0),
            "u_f": MinMaxNormalization(min=-60.0, max=60.0),
        }

    @classmethod
    def _default_static_params(cls):
        return {
            "r_s": 0.25,
            "r_f": 2.0,
            "l_d": 3.0e-3,
            "l_q": 4.0e-3,
            "l_f": 120.0e-3,
            "l_m": 15.0e-3,
            "p": 3.0,
            "omega_el": 2.0 * 3.141592653589793 * 50.0,  # electrical rad/s, frozen
        }

    @pytree_dataclass
    class PhysicalState:
        """Physical state of the machine."""

        i_d: jax.Array
        i_q: jax.Array
        i_f: jax.Array

    @pytree_dataclass
    class Additions:
        """Solver carry threaded between steps."""

        solver_state: tuple
        active_solver_state: bool

    @pytree_dataclass
    class StaticParams:
        """Electrical parameters (``omega_el`` = frozen electrical speed)."""

        r_s: jax.Array
        r_f: jax.Array
        l_d: jax.Array
        l_q: jax.Array
        l_f: jax.Array
        l_m: jax.Array
        p: jax.Array
        omega_el: jax.Array

    @pytree_dataclass
    class Action:
        """Stator dq voltages + field voltage."""

        u_d: jax.Array
        u_q: jax.Array
        u_f: jax.Array

    def _ode(self, t, y, args, action):
        i_d, i_q, i_f = y
        params = args
        u = action(t)
        det = params.l_d * params.l_f - params.l_m * params.l_m
        p_d = u[0] - params.r_s * i_d + params.omega_el * params.l_q * i_q
        p_q = u[1] - params.r_s * i_q - params.omega_el * (
            params.l_d * i_d + params.l_m * i_f
        )
        p_f = u[2] - params.r_f * i_f
        d_i_d = (params.l_f * p_d - params.l_m * p_f) / det
        d_i_q = p_q / params.l_q
        d_i_f = (params.l_d * p_f - params.l_m * p_d) / det
        return d_i_d, d_i_q, d_i_f

    def torque(self, state, env_properties=None):
        """Electromagnetic torque of (a batch of) states:
        ``1.5 p (l_m i_f i_q + (l_d - l_q) i_d i_q)`` — excitation plus
        reluctance component."""
        params = (env_properties or self.env_properties).static_params
        phys = state.physical_state
        return (
            1.5
            * params.p
            * (
                params.l_m * phys.i_f * phys.i_q
                + (params.l_d - params.l_q) * phys.i_d * phys.i_q
            )
        )
