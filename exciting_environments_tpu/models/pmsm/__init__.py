"""PMSM drive environment and motor presets."""

from exciting_environments_tpu.models.pmsm.motor_parameters import MotorVariant
from exciting_environments_tpu.models.pmsm.pmsm_env import PMSM
