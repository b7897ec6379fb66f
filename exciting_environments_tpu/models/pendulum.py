"""Torque-actuated nonlinear pendulum.

Behavior-compatible with the reference environment
``/root/reference/exciting_environments/pendulum/pendulum_env.py`` (state
variables ``theta``/``omega``, torque action, angle wrapped to (-pi, pi],
default initial state theta = pi in physical units).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from exciting_environments_tpu.core.classic import ClassicODEEnvironment
from exciting_environments_tpu.core.structures import pytree_dataclass
from exciting_environments_tpu.utils import MinMaxNormalization


class Pendulum(ClassicODEEnvironment):
    """
    State Variables:
        ``['theta', 'omega']``

    Action Variable:
        ``['torque']``

    Initial State:
        Unless chosen otherwise, ``theta=pi`` and ``omega=0``.

    Dynamics (point mass ``m`` on a massless rod of length ``l``):
        ``d_omega = (torque + l*m*g*sin(theta)) / (m*l^2)``
        (reference ``pendulum_env.py:144-150``).

    Example:
        >>> import jax.numpy as jnp
        >>> import exciting_environments_tpu as excenvs
        >>> env = excenvs.Pendulum(batch_size=4)
        >>> obs, state = env.vmap_reset()
        >>> obs, state = env.vmap_step(state, jnp.zeros((4, 1)))
    """

    _default_batch_size = 8
    _default_tau = 1e-4
    _ode_state_fields = ("theta", "omega")
    _angle_fields = ("theta",)
    _sincos_reward_fields = ("theta",)
    _soft_constrained_fields = ("omega",)
    _default_init_norm = {"theta": 1.0, "omega": 0.0}

    @classmethod
    def _default_physical_normalizations(cls):
        return {
            "theta": MinMaxNormalization(min=-jnp.pi, max=jnp.pi),
            "omega": MinMaxNormalization(min=-10, max=10),
        }

    @classmethod
    def _default_action_normalizations(cls):
        return {"torque": MinMaxNormalization(min=-20, max=20)}

    @classmethod
    def _default_static_params(cls):
        return {"g": 9.81, "l": 2, "m": 1}

    @pytree_dataclass
    class PhysicalState:
        """Physical state of the environment."""

        theta: jax.Array
        omega: jax.Array

    @pytree_dataclass
    class Additions:
        """Solver carry threaded between steps."""

        solver_state: tuple
        active_solver_state: bool

    @pytree_dataclass
    class StaticParams:
        """Static parameters of the environment."""

        g: jax.Array
        l: jax.Array
        m: jax.Array

    @pytree_dataclass
    class Action:
        """Action applicable to the environment."""

        torque: jax.Array

    def _ode(self, t, y, args, action):
        theta, omega = y
        params = args
        d_omega = (action(t)[0] + params.l * params.m * params.g * self._sin(theta)) / (
            params.m * (params.l) ** 2
        )
        d_theta = omega
        return d_theta, d_omega
