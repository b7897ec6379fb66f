"""Fluid tank based on Torricelli's principle.

Behavior-compatible with
``/root/reference/exciting_environments/fluid_tank/fluid_tank_env.py``
(single state ``height``, inflow action, height clipped to >= 0 both inside
the ODE and after each solver step).  Based on ex. 7.3.2, p. 355 of
"System Dynamics", Palm, William III.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from exciting_environments_tpu.core.classic import ClassicODEEnvironment
from exciting_environments_tpu.core.structures import pytree_dataclass
from exciting_environments_tpu.utils import MinMaxNormalization


class FluidTank(ClassicODEEnvironment):
    """
    State Variables:
        ``['height']``

    Action Variable:
        ``['inflow']``

    Dynamics (reference ``fluid_tank_env.py:97-106``):
        ``dh/dt = inflow/A - c_d * A_o / A * sqrt(2 g h)`` with ``h`` clipped
        to be non-negative; the solver output is clipped again because a
        discrete step can undershoot an empty tank.
    """

    _default_batch_size = 1
    _default_tau = 1e-3
    _ode_state_fields = ("height",)
    _angle_fields = ()
    _sincos_reward_fields = ()
    _soft_constrained_fields = ()
    _default_init_norm = {"height": 0.0}
    # random resets draw the normalized height from [0, 1] (tank cannot be
    # "negatively full"; reference fluid_tank_env.py:227)
    _init_uniform_minval = 0.0

    @classmethod
    def _default_physical_normalizations(cls):
        return {"height": MinMaxNormalization(min=0, max=3)}

    @classmethod
    def _default_action_normalizations(cls):
        return {"inflow": MinMaxNormalization(min=0, max=0.2)}

    @classmethod
    def _default_static_params(cls):
        # c_d = 0.6 typical value for water [Palm2010]
        return {
            "base_area": jnp.pi,
            "orifice_area": jnp.pi * 0.1**2,
            "c_d": 0.6,
            "g": 9.81,
        }

    @pytree_dataclass
    class PhysicalState:
        """Physical state of the environment."""

        height: jax.Array

    @pytree_dataclass
    class Additions:
        """Solver carry threaded between steps."""

        solver_state: tuple
        active_solver_state: bool

    @pytree_dataclass
    class StaticParams:
        """Static parameters of the environment."""

        base_area: jax.Array
        orifice_area: jax.Array
        c_d: jax.Array
        g: jax.Array

    @pytree_dataclass
    class Action:
        """Action applicable to the environment."""

        inflow: jax.Array

    def _ode(self, t, y, args, action):
        h = y[0]
        params = args
        h = jnp.clip(h, 0)
        dh_dt = action(t)[0] / params.base_area - params.c_d * params.orifice_area / params.base_area * jnp.sqrt(
            2 * params.g * h
        )
        return (dh_dt,)

    def _clip_state(self, y):
        # tank cannot be more empty than empty; needed because a discrete
        # solver step may overshoot below zero (reference fluid_tank_env.py:144-146)
        return (jnp.clip(y[0], 0),)

    @partial(jax.jit, static_argnums=0)
    def generate_truncated(self, state, env_properties):
        """The tank never truncates."""
        return jnp.array([0])

    @partial(jax.jit, static_argnums=0)
    def generate_terminated(self, state, reward, env_properties):
        """The tank never terminates."""
        return jnp.array([False])

    @property
    def states_description(self):
        return np.array(["fluid height"])

    @property
    def obs_description(self):
        return np.hstack(
            [
                self.states_description,
                np.array([name + "_ref" for name in self.control_state]),
            ]
        )
