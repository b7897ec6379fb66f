"""Acrobot: two-link underactuated arm with torque on the second joint.

Behavior-compatible with
``/root/reference/exciting_environments/acrobot/acrobot_env.py`` (state
variables ``theta_1``/``theta_2``/``omega_1``/``omega_2``, both angles
wrapped to (-pi, pi]).

Note: the reference's ``default_soft_constraints`` references a nonexistent
``"omega"`` field (``acrobot_env.py:450-463``, latent bug, unreachable in its
tests).  This implementation constrains the actual fields ``omega_1`` and
``omega_2`` instead — a deliberate fix documented here for parity review.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from exciting_environments_tpu.core.classic import ClassicODEEnvironment
from exciting_environments_tpu.core.structures import pytree_dataclass
from exciting_environments_tpu.utils import MinMaxNormalization


class Acrobot(ClassicODEEnvironment):
    """
    State Variables:
        ``['theta_1', 'theta_2', 'omega_1', 'omega_2']``

    Action Variable:
        ``['torque']`` (applied at the elbow joint)

    Initial State:
        Unless chosen otherwise, ``theta_1=pi`` (hanging down) and all other
        components zero.

    Dynamics (reference ``acrobot_env.py:171-197``): full two-link manipulator
    equations with inertia matrix entries ``d_11``/``d_12``/``d_22``,
    Coriolis/centrifugal terms ``h_1``/``h_2`` and gravity terms
    ``phi_1``/``phi_2``.
    """

    _default_batch_size = 8
    _default_tau = 1e-3
    _ode_state_fields = ("theta_1", "theta_2", "omega_1", "omega_2")
    _angle_fields = ("theta_1", "theta_2")
    _sincos_reward_fields = ("theta_1", "theta_2")
    _soft_constrained_fields = ("omega_1", "omega_2")
    _default_init_norm = {"theta_1": 1.0, "theta_2": 0.0, "omega_1": 0.0, "omega_2": 0.0}

    @classmethod
    def _default_physical_normalizations(cls):
        return {
            "theta_1": MinMaxNormalization(min=-jnp.pi, max=jnp.pi),
            "theta_2": MinMaxNormalization(min=-jnp.pi, max=jnp.pi),
            "omega_1": MinMaxNormalization(min=-10, max=10),
            "omega_2": MinMaxNormalization(min=-10, max=10),
        }

    @classmethod
    def _default_action_normalizations(cls):
        return {"torque": MinMaxNormalization(min=-20, max=20)}

    @classmethod
    def _default_static_params(cls):
        return {
            "g": 9.81,
            "l_1": 2,
            "l_2": 2,
            "m_1": 1,
            "m_2": 1,
            "l_c1": 1,
            "l_c2": 1,
            "I_1": 1.3,
            "I_2": 1.3,
        }

    @pytree_dataclass
    class PhysicalState:
        """Physical state of the environment."""

        theta_1: jax.Array
        theta_2: jax.Array
        omega_1: jax.Array
        omega_2: jax.Array

    @pytree_dataclass
    class Additions:
        """Solver carry threaded between steps."""

        solver_state: tuple
        active_solver_state: bool

    @pytree_dataclass
    class StaticParams:
        """Static parameters of the environment."""

        g: jax.Array
        l_1: jax.Array
        l_2: jax.Array
        m_1: jax.Array
        m_2: jax.Array
        l_c1: jax.Array
        l_c2: jax.Array
        I_1: jax.Array
        I_2: jax.Array

    @pytree_dataclass
    class Action:
        """Action applicable to the environment."""

        torque: jax.Array

    def _ode(self, t, y, args, action):
        theta_1, theta_2, omega_1, omega_2 = y
        params = args
        d_11 = (
            params.m_1 * params.l_c1**2
            + params.m_2
            * (params.l_1**2 + params.l_c2**2 + 2 * params.l_1 * params.l_c2 * self._cos(theta_2))
            + params.I_1
            + params.I_2
        )
        d_12 = params.m_2 * (params.l_c2**2 + params.l_1 * params.l_c2 * self._cos(theta_2)) + params.I_2
        d_22 = params.m_2 * params.l_c2**2 + params.I_2
        h_1 = (
            -params.m_2 * params.l_1 * params.l_c2 * self._sin(theta_2) * omega_2**2
            - 2 * params.m_2 * params.l_1 * params.l_c2 * self._sin(theta_2) * omega_1 * omega_2
        )
        h_2 = params.m_2 * params.l_1 * params.l_c2 * self._sin(theta_2) * omega_1**2
        phi_1 = (params.m_1 * params.l_c1 + params.m_2 * params.l_1) * params.g * self._cos(
            theta_1 + jnp.pi / 2
        ) + params.m_2 * params.l_c2 * params.g * self._cos(theta_1 + theta_2 + jnp.pi / 2)
        phi_2 = params.m_2 * params.l_c2 * params.g * self._cos(theta_1 + theta_2 + jnp.pi / 2)
        d_omega_1 = (
            1 / (d_12 - d_22 / d_12 * d_11) * (action(t)[0] + d_22 / d_12 * (h_1 + phi_1) - h_2 - phi_2)
        )
        d_omega_2 = (-d_11 * d_omega_1 - h_1 - phi_1) / d_12
        d_theta_1 = omega_1
        d_theta_2 = omega_2
        return d_theta_1, d_theta_2, d_omega_1, d_omega_2
