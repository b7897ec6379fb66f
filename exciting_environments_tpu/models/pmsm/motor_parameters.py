"""PMSM motor parameter presets (DEFAULT / BRUSA / SEW).

Behavior-compatible with
``/root/reference/exciting_environments/pmsm/motor_parameters.py``: each
variant bundles physical/action normalizations, static electrical parameters
and (for the measured machines) flux/inductance lookup tables.

The measured LUTs are shipped as ``.npz`` assets under
``exciting_environments_tpu/models/pmsm_data/`` (converted from the
reference's MATLAB ``.mat`` files; identical array contents, loadable without
``scipy.io``).
"""

from __future__ import annotations

from copy import deepcopy
from dataclasses import fields
from enum import Enum
from pathlib import Path
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from exciting_environments_tpu.core import structures
from exciting_environments_tpu.core.structures import pytree_dataclass
from exciting_environments_tpu.utils import MinMaxNormalization

_DATA_DIR = Path(__file__).resolve().parent.parent / "pmsm_data"


def _load_lut(name: str) -> dict:
    with np.load(_DATA_DIR / f"LUT_{name}.npz") as data:
        return {k: np.array(data[k]) for k in data.files}


@pytree_dataclass
class PhysicalNormalizations:
    u_d_buffer: float
    u_q_buffer: float
    epsilon: float
    i_d: float
    i_q: float
    omega_el: float
    torque: float


@pytree_dataclass
class ActionNormalizations:
    u_d: float
    u_q: float


@pytree_dataclass
class StaticParams:
    p: int  # number of pole pairs
    r_s: float  # stator resistance
    l_d: float  # d-axis inductance
    l_q: float  # q-axis inductance
    psi_p: float  # permanent magnet flux linkage
    u_dc: float  # DC link voltage
    deadtime: int  # actuation delay in control steps


@pytree_dataclass
class MotorParams:
    physical_normalizations: PhysicalNormalizations
    action_normalizations: ActionNormalizations
    static_params: StaticParams
    default_soft_constraints: Callable
    pmsm_lut: dict


def default_soft_constraints(self, state, action_norm, env_properties):
    """ReLU(|x|-1) soft constraint on every normalized physical-state field."""
    state_norm = self.normalize_state(state, env_properties)
    physical_state_norm = state_norm.physical_state
    with structures.copy_and_mutate(physical_state_norm, validate=False) as phys_soft_const:
        for field in fields(phys_soft_const):
            name = field.name
            setattr(
                phys_soft_const,
                name,
                jax.nn.relu(jnp.abs(getattr(physical_state_norm, name)) - 1.0),
            )
    return phys_soft_const, None


def _make_brusa() -> MotorParams:
    return MotorParams(
        physical_normalizations=PhysicalNormalizations(
            u_d_buffer=MinMaxNormalization(min=(-2 * 400 / 3), max=(2 * 400 / 3)),
            u_q_buffer=MinMaxNormalization(min=(-2 * 400 / 3), max=(2 * 400 / 3)),
            epsilon=MinMaxNormalization(min=(-jnp.pi), max=(jnp.pi)),
            i_d=MinMaxNormalization(min=(-250), max=(0)),
            i_q=MinMaxNormalization(min=(-250), max=(250)),
            omega_el=MinMaxNormalization(min=0, max=(3 * 11000 * 2 * jnp.pi / 60)),
            torque=MinMaxNormalization(min=(-200), max=(200)),
        ),
        action_normalizations=ActionNormalizations(
            u_d=MinMaxNormalization(min=(-2 * 400 / 3), max=(2 * 400 / 3)),
            u_q=MinMaxNormalization(min=(-2 * 400 / 3), max=(2 * 400 / 3)),
        ),
        static_params=StaticParams(
            p=3,
            r_s=17.932e-3,
            l_d=0.37e-3,
            l_q=1.2e-3,
            psi_p=65.65e-3,
            u_dc=400,
            deadtime=1,
        ),
        default_soft_constraints=default_soft_constraints,
        pmsm_lut=_load_lut("BRUSA"),
    )


def _make_sew() -> MotorParams:
    return MotorParams(
        physical_normalizations=PhysicalNormalizations(
            u_d_buffer=MinMaxNormalization(min=(-2 * 550 / 3), max=(2 * 550 / 3)),
            u_q_buffer=MinMaxNormalization(min=(-2 * 550 / 3), max=(2 * 550 / 3)),
            epsilon=MinMaxNormalization(min=(-jnp.pi), max=(jnp.pi)),
            i_d=MinMaxNormalization(min=(-16), max=(0)),
            i_q=MinMaxNormalization(min=(-16), max=(16)),
            omega_el=MinMaxNormalization(min=0, max=(4 * 2000 / 60 * 2 * jnp.pi)),
            torque=MinMaxNormalization(min=(-15), max=(15)),
        ),
        action_normalizations=ActionNormalizations(
            u_d=MinMaxNormalization(min=(-2 * 550 / 3), max=(2 * 550 / 3)),
            u_q=MinMaxNormalization(min=(-2 * 550 / 3), max=(2 * 550 / 3)),
        ),
        static_params=StaticParams(
            p=4,
            r_s=208e-3,
            l_d=1.44e-3,
            l_q=1.44e-3,
            psi_p=122e-3,
            u_dc=550,
            deadtime=1,
        ),
        default_soft_constraints=default_soft_constraints,
        pmsm_lut=_load_lut("SEW"),
    )


def _make_default() -> MotorParams:
    return MotorParams(
        physical_normalizations=PhysicalNormalizations(
            u_d_buffer=MinMaxNormalization(min=(-2 * 400 / 3), max=(2 * 400 / 3)),
            u_q_buffer=MinMaxNormalization(min=(-2 * 400 / 3), max=(2 * 400 / 3)),
            epsilon=MinMaxNormalization(min=(-jnp.pi), max=(jnp.pi)),
            i_d=MinMaxNormalization(min=(-250), max=(0)),
            i_q=MinMaxNormalization(min=(-250), max=(250)),
            omega_el=MinMaxNormalization(min=0, max=(3 * 11000 * 2 * jnp.pi / 60)),
            torque=MinMaxNormalization(min=(-200), max=(200)),
        ),
        action_normalizations=ActionNormalizations(
            u_d=MinMaxNormalization(min=(-2 * 400 / 3), max=(2 * 400 / 3)),
            u_q=MinMaxNormalization(min=(-2 * 400 / 3), max=(2 * 400 / 3)),
        ),
        static_params=StaticParams(
            p=3,
            r_s=15e-3,
            l_d=0.37e-3,
            l_q=1.2e-3,
            psi_p=65.6e-3,
            u_dc=400,
            deadtime=1,
        ),
        default_soft_constraints=default_soft_constraints,
        pmsm_lut=None,
    )


BRUSA = _make_brusa()
SEW = _make_sew()
DEFAULT = _make_default()


class MotorVariant(Enum):
    """Selectable motor presets; ``get_params`` returns a defensive copy."""

    DEFAULT = "DEFAULT"
    BRUSA = "BRUSA"
    SEW = "SEW"

    def get_params(self) -> MotorParams:
        if self is MotorVariant.BRUSA:
            return deepcopy(BRUSA)
        elif self is MotorVariant.SEW:
            return deepcopy(SEW)
        else:
            return deepcopy(DEFAULT)
