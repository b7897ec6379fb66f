"""exciting-environments-tpu: a TPU-native batched ODE environment engine.

Drop-in capable replacement for ``exciting-environments`` (same environment
classes, registry ids, wrapper surface and numerical behavior), re-designed
for TPU: in-house fixed-step ODE solvers, a ``lax.scan`` trajectory engine,
fused Pallas rollout kernels and ``jax.sharding`` mesh parallelism over the
batch axis.
"""

__version__ = "0.1.0"

from exciting_environments_tpu.core import spaces
from exciting_environments_tpu.core.classic import ClassicODEEnvironment
from exciting_environments_tpu.core.env import CoreEnvironment
from exciting_environments_tpu.core.registration import EnvironmentRegistry
from exciting_environments_tpu.models import (
    EESM,
    PMSM,
    Acrobot,
    CartPole,
    FluidTank,
    InductionMachine,
    MassSpringDamper,
    MotorVariant,
    Pendulum,
    VanDerPol,
)
from exciting_environments_tpu.ops import solvers
from exciting_environments_tpu.utils import MinMaxNormalization
from exciting_environments_tpu.utils import checkpoint, profiling, randomize
from exciting_environments_tpu.wrappers.gym import GymWrapper


def __getattr__(name):
    # MujucoWrapper / GymnasiumVectorEnv import mujoco / gymnasium lazily so
    # the core package stays usable without the optional extras.
    if name == "MujucoWrapper":
        from exciting_environments_tpu.wrappers.mujoco import MujucoWrapper

        return MujucoWrapper
    if name == "GymnasiumVectorEnv":
        from exciting_environments_tpu.wrappers.gymnasium_vector import (
            GymnasiumVectorEnv,
        )

        return GymnasiumVectorEnv
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
