"""Electrical reference-frame transforms and inverter constraints for PMSM drives.

Math-equivalent to the helpers at the top of the reference's
``/root/reference/exciting_environments/pmsm/pmsm_env.py:21-112`` (Clarke/Park
transforms, electrical-angle stepping, voltage-hexagon clipping).  All
functions are scalar-per-sample and fully traceable, so they fuse into the
surrounding step computation under ``vmap``/``jit`` on TPU.

Precision note: the hexagon sector-rotation table is kept in ``complex64``
exactly like the reference (``pmsm_env.py:37-43``) so golden-trajectory
replays agree bit-for-bit at the pinned tolerance even under float64.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Clarke transform alpha/beta -> abc (power-invariant 2/3 convention)
T32 = jnp.array([[1, 0], [-0.5, 0.5 * jnp.sqrt(3)], [-0.5, -0.5 * jnp.sqrt(3)]])
# abc -> alpha/beta
T23 = 2 / 3 * jnp.array([[1, 0], [-0.5, 0.5 * jnp.sqrt(3)], [-0.5, -0.5 * jnp.sqrt(3)]]).T


def _build_rotation_map() -> jnp.ndarray:
    """Sector-dependent complex rotations used by :func:`apply_hex_constraint`.

    Indexed by the three half-plane sign bits of the voltage phasor w.r.t. the
    hexagon's symmetry axes; each entry rotates its sector onto the reference
    sector at the top of the hexagon.
    """
    rot = np.ones((2, 2, 2), dtype=np.complex64)
    s3 = np.sqrt(3)
    rot[1, 0, 1] = 0.5 * (1 + s3 * 1j)
    rot[1, 1, 0] = 0.5 * (1 - s3 * 1j)
    rot[0, 1, 0] = 0.5 * (-1 - s3 * 1j)
    rot[0, 1, 1] = -1
    rot[0, 0, 1] = 0.5 * (-1 + s3 * 1j)
    return jnp.array(rot)


ROTATION_MAP = _build_rotation_map()


def t_dq_alpha_beta(eps):
    """Rotation matrix between the DQ and alpha-beta reference frames."""
    cos = jnp.cos(eps)
    sin = jnp.sin(eps)
    return jnp.column_stack((cos, sin, -sin, cos)).reshape(2, 2)


def dq2albet(u_dq, eps):
    """DQ -> alpha-beta (inverse Park) at electrical angle ``eps``."""
    q = t_dq_alpha_beta(-eps)
    return (q @ u_dq.T).T


def albet2dq(u_albet, eps):
    """alpha-beta -> DQ (Park) at electrical angle ``eps``."""
    q_inv = t_dq_alpha_beta(eps)
    return (q_inv @ u_albet.T).T


def dq2abc(u_dq, eps):
    """DQ -> three-phase abc."""
    return (T32 @ dq2albet(u_dq, eps).T).T


def abc2dq(u_abc, eps):
    """Three-phase abc -> DQ."""
    u_alpha_beta = T23 @ u_abc.T
    return albet2dq(u_alpha_beta.T, eps)


def step_eps(eps, omega_el, tau, tau_scale=1.0):
    """Advance the electrical angle by ``omega_el * tau * tau_scale`` and wrap
    into (-pi, pi]."""
    eps += omega_el * tau * tau_scale
    eps %= 2 * jnp.pi
    boolean = eps > jnp.pi
    eps = eps + boolean * (-2 * jnp.pi)
    return eps


def apply_hex_constraint(u_albet):
    """Clip an alpha-beta voltage phasor into the inverter voltage hexagon.

    Implementation: treat the phasor as a complex number, rotate its sector
    onto the reference sector via :data:`ROTATION_MAP`, clip the rectangle
    covering that sector, and rotate back (reference ``pmsm_env.py:92-102``).
    Input shape ``(2,)``, output shape ``(1, 2)``.
    """
    u_c = u_albet[0] + 1j * u_albet[1]
    idx = (jnp.sin(jnp.angle(u_c)[..., jnp.newaxis] - 2 / 3 * jnp.pi * jnp.arange(3)) >= 0).astype(int)
    rot_vec = ROTATION_MAP[idx[0], idx[1], idx[2]]
    u_c = u_c * rot_vec  # rotate sector upwards
    u_c = jnp.clip(u_c.real, -2 / 3, 2 / 3) + 1j * u_c.imag
    u_c = u_c.real + 1j * jnp.clip(u_c.imag, 0, 2 / 3 * jnp.sqrt(3))
    u_c = u_c * jnp.conjugate(rot_vec)  # rotate back
    return jnp.column_stack([u_c.real, u_c.imag])


def clip_in_abc_coordinates(u_dq, u_dc, omega_el, eps, tau):
    """Clip DQ voltages phase-wise in abc coordinates and transform back."""
    eps_advanced = step_eps(eps, omega_el, tau, 0.5)
    u_abc = dq2abc(u_dq, eps_advanced)
    u_abc = jnp.clip(u_abc, -u_dc / 2.0, u_dc / 2.0)
    return abc2dq(u_abc, eps)
