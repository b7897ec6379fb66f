"""Environment registry.

Exposes the same surface as the reference's enum registry
(``exciting_environments/registration.py``: ``EnvironmentRegistry.PENDULUM
.make(**kwargs)`` with the ``"<Name>-v0"`` id strings) but is backed by an
extensible id->constructor table: downstream projects can plug in their own
environments with :func:`register` and build them via :func:`make` without
touching this module.
"""

from __future__ import annotations

from enum import Enum
from typing import Callable, Dict

#: global id -> environment-class resolver table
_REGISTRY: Dict[str, Callable] = {}


def register(env_id: str, resolver: Callable) -> None:
    """Register an environment id.

    Args:
        env_id: id string, conventionally ``"<Name>-v<version>"``.
        resolver: zero-argument callable returning the environment class
            (kept lazy so registration does not import heavy modules).
    """
    _REGISTRY[env_id] = resolver


def resolve(env_id: str) -> Callable:
    """Return the environment CLASS behind an id without constructing an
    instance (class-attribute lookups like ``_default_static_params`` should
    not pay for LUT loading or device-array construction)."""
    try:
        resolver = _REGISTRY[env_id]
    except KeyError:
        raise ValueError(f"Unknown environment: {env_id!r}. Registered: {sorted(_REGISTRY)}")
    return resolver()


def make(env_id: str, **env_kwargs):
    """Instantiate a registered environment by id string."""
    return resolve(env_id)(**env_kwargs)


def _builtin(name: str) -> Callable:
    def resolver():
        import exciting_environments_tpu.models as models

        return getattr(models, name)

    return resolver


for _name in ("Pendulum", "CartPole", "Acrobot", "MassSpringDamper", "FluidTank", "PMSM", "VanDerPol", "InductionMachine", "EESM"):
    register(f"{_name}-v0", _builtin(_name))


class EnvironmentRegistry(Enum):
    """Enum facade over the registry (reference-compatible ids)."""

    CART_POLE = "CartPole-v0"
    MASS_SPRING_DAMPER = "MassSpringDamper-v0"
    PENDULUM = "Pendulum-v0"
    FLUID_TANK = "FluidTank-v0"
    PMSM = "PMSM-v0"
    ACROBOT = "Acrobot-v0"
    VAN_DER_POL = "VanDerPol-v0"  # beyond-reference stiffness benchmark
    INDUCTION_MACHINE = "InductionMachine-v0"  # beyond-reference drive workhorse
    EESM = "EESM-v0"  # beyond-reference magnet-free traction drive

    def make(self, **env_kwargs):
        """Instantiate the environment class behind this registry id."""
        return make(self.value, **env_kwargs)
