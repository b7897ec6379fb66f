"""Environment id registry (reference ``exciting_environments/registration.py``)."""

from __future__ import annotations

from enum import Enum


class EnvironmentRegistry(Enum):
    """Maps environment id strings to their classes; construct via ``.make()``."""

    CART_POLE = "CartPole-v0"
    MASS_SPRING_DAMPER = "MassSpringDamper-v0"
    PENDULUM = "Pendulum-v0"
    FLUID_TANK = "FluidTank-v0"
    PMSM = "PMSM-v0"
    ACROBOT = "Acrobot-v0"

    def make(self, **env_kwargs):
        """Instantiate the environment class behind this registry id."""
        from exciting_environments_tpu.models.acrobot import Acrobot
        from exciting_environments_tpu.models.cart_pole import CartPole
        from exciting_environments_tpu.models.fluid_tank import FluidTank
        from exciting_environments_tpu.models.mass_spring_damper import MassSpringDamper
        from exciting_environments_tpu.models.pendulum import Pendulum
        from exciting_environments_tpu.models.pmsm import PMSM

        env_map = {
            EnvironmentRegistry.CART_POLE: CartPole,
            EnvironmentRegistry.MASS_SPRING_DAMPER: MassSpringDamper,
            EnvironmentRegistry.PENDULUM: Pendulum,
            EnvironmentRegistry.FLUID_TANK: FluidTank,
            EnvironmentRegistry.PMSM: PMSM,
            EnvironmentRegistry.ACROBOT: Acrobot,
        }
        cls = env_map.get(self)
        if cls is None:
            raise ValueError(f"Unknown environment: {self}")
        return cls(**env_kwargs)
