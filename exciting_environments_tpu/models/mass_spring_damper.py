"""Linear mass-spring-damper oscillator.

Behavior-compatible with
``/root/reference/exciting_environments/mass_spring_damper/mass_spring_damper_env.py``
(state variables ``deflection``/``velocity``, force action).
"""

from __future__ import annotations

import jax

from exciting_environments_tpu.core.classic import ClassicODEEnvironment
from exciting_environments_tpu.core.structures import pytree_dataclass
from exciting_environments_tpu.utils import MinMaxNormalization


class MassSpringDamper(ClassicODEEnvironment):
    """
    State Variables:
        ``['deflection', 'velocity']``

    Action Variable:
        ``['force']``

    Initial State:
        Unless chosen otherwise, deflection and velocity are zero.

    Dynamics:
        ``d_velocity = (force - d*velocity - k*deflection) / m``
        (reference ``mass_spring_damper_env.py:142-148``).
    """

    _default_batch_size = 8
    _default_tau = 1e-4
    _ode_state_fields = ("deflection", "velocity")
    _angle_fields = ()
    _sincos_reward_fields = ()
    _soft_constrained_fields = ("deflection", "velocity")
    _default_init_norm = {"deflection": 0.0, "velocity": 0.0}

    @classmethod
    def _default_physical_normalizations(cls):
        return {
            "deflection": MinMaxNormalization(min=-10, max=10),
            "velocity": MinMaxNormalization(min=-10, max=10),
        }

    @classmethod
    def _default_action_normalizations(cls):
        return {"force": MinMaxNormalization(min=-20, max=20)}

    @classmethod
    def _default_static_params(cls):
        return {"k": 100, "d": 1, "m": 1}

    @pytree_dataclass
    class PhysicalState:
        """Physical state of the environment."""

        deflection: jax.Array
        velocity: jax.Array

    @pytree_dataclass
    class Additions:
        """Solver carry threaded between steps."""

        solver_state: tuple
        active_solver_state: bool

    @pytree_dataclass
    class StaticParams:
        """Static parameters of the environment."""

        d: jax.Array
        k: jax.Array
        m: jax.Array

    @pytree_dataclass
    class Action:
        """Action applicable to the environment."""

        force: jax.Array

    def _ode(self, t, y, args, action):
        deflection, velocity = y
        params = args
        d_velocity = (action(t)[0] - params.d * velocity - params.k * deflection) / params.m
        d_deflection = velocity
        return d_deflection, d_velocity
