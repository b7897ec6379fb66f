"""Forced Van der Pol oscillator (beyond-reference environment).

Not in the reference suite — included both as a stiffness benchmark (the
damping nonlinearity ``mu (1 - x^2) v`` makes the system progressively
stiff as ``mu`` grows, which is what the per-instance adaptive integrator
and the implicit Euler solver are for) and as the worked example of the
"defining your own environment" guide (``docs/parts/custom_environments.rst``):
the whole declarative subclass is ~80 lines, and every engine feature —
vmap batching, per-batch heterogeneous ``mu``, the fused Pallas rollout
kernel, mesh sharding, wrappers — applies to it with no further code.
"""

from __future__ import annotations

import jax

from exciting_environments_tpu.core.classic import ClassicODEEnvironment
from exciting_environments_tpu.core.structures import pytree_dataclass
from exciting_environments_tpu.utils import MinMaxNormalization


class VanDerPol(ClassicODEEnvironment):
    """
    State Variables:
        ``['position', 'velocity']``

    Action Variable:
        ``['force']``

    Initial State:
        Unless chosen otherwise, ``position = 1`` and ``velocity = 0``.

    Dynamics:
        ``d_position = velocity``
        ``d_velocity = mu * (1 - position^2) * velocity - position + force``

    The unforced system converges to a limit cycle whose relaxation phases
    sharpen with ``mu`` (stiffness parameter); per-batch ``mu`` arrays give a
    heterogeneous stiffness sweep in one rollout.
    """

    _default_batch_size = 8
    _default_tau = 1e-4
    _ode_state_fields = ("position", "velocity")
    _angle_fields = ()
    _sincos_reward_fields = ()
    _soft_constrained_fields = ("position", "velocity")
    _default_init_norm = {"position": 0.25, "velocity": 0.0}

    @classmethod
    def _default_physical_normalizations(cls):
        return {
            "position": MinMaxNormalization(min=-4, max=4),
            "velocity": MinMaxNormalization(min=-15, max=15),
        }

    @classmethod
    def _default_action_normalizations(cls):
        return {"force": MinMaxNormalization(min=-5, max=5)}

    @classmethod
    def _default_static_params(cls):
        return {"mu": 5.0}

    @pytree_dataclass
    class PhysicalState:
        """Physical state of the environment."""

        position: jax.Array
        velocity: jax.Array

    @pytree_dataclass
    class Additions:
        """Solver carry threaded between steps."""

        solver_state: tuple
        active_solver_state: bool

    @pytree_dataclass
    class StaticParams:
        """Static parameters of the environment."""

        mu: jax.Array

    @pytree_dataclass
    class Action:
        """Action applicable to the environment."""

        force: jax.Array

    def _ode(self, t, y, args, action):
        position, velocity = y
        params = args
        d_position = velocity
        d_velocity = (
            params.mu * (1 - position * position) * velocity - position + action(t)[0]
        )
        return d_position, d_velocity
