"""Physics environment implementations."""

from exciting_environments_tpu.models.acrobot import Acrobot
from exciting_environments_tpu.models.cart_pole import CartPole
from exciting_environments_tpu.models.fluid_tank import FluidTank
from exciting_environments_tpu.models.mass_spring_damper import MassSpringDamper
from exciting_environments_tpu.models.pendulum import Pendulum
from exciting_environments_tpu.models.pmsm import PMSM, MotorVariant
from exciting_environments_tpu.models.van_der_pol import VanDerPol
from exciting_environments_tpu.models.induction_machine import InductionMachine
from exciting_environments_tpu.models.eesm import EESM
