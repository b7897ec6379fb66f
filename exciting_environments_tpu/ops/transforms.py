"""Electrical reference-frame transforms and inverter constraints for PMSM drives.

Math-equivalent to the helpers at the top of the reference's
``/root/reference/exciting_environments/pmsm/pmsm_env.py:21-112`` (Clarke/Park
transforms, electrical-angle stepping, voltage-hexagon clipping).  All
functions are scalar-per-sample and fully traceable, so they fuse into the
surrounding step computation under ``vmap``/``jit`` on TPU.

TPU-specific design decisions:

* **No complex arithmetic.** The reference rotates hexagon sectors with a
  ``complex64`` lookup table (``pmsm_env.py:37-43``).  TPU backends have no
  complex support — on the axon runtime even *creating* a complex array
  aborts the client — so the sector rotation here is the equivalent
  real-valued 2-D rotation, with the table stored as separate float32
  real/imaginary parts.  The float32 component values are bit-identical to
  the reference's ``complex64`` table, so golden-trajectory replays agree at
  the pinned tolerance even under float64.
* **No device constants at import time.** Module-level tables are NumPy
  arrays; they become compile-time constants the first time a jitted
  function closes over them.  Importing this package therefore performs no
  device operations at all.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_SQRT3 = np.sqrt(3.0)

# Clarke transform alpha/beta -> abc (2/3 convention); NumPy so that import
# performs no device work.
T32 = np.array([[1.0, 0.0], [-0.5, 0.5 * _SQRT3], [-0.5, -0.5 * _SQRT3]])
# abc -> alpha/beta
T23 = 2.0 / 3.0 * T32.T


def _build_rotation_table():
    """Sector-dependent rotations used by :func:`apply_hex_constraint`.

    Indexed by the three half-plane sign bits of the voltage phasor w.r.t.
    the hexagon's symmetry axes; each entry rotates its sector onto the
    reference sector at the top of the hexagon.  Stored as float32
    (real, imag) pairs — the exact component values of the reference's
    ``complex64`` table.
    """
    re = np.ones((2, 2, 2), dtype=np.float64)
    im = np.zeros((2, 2, 2), dtype=np.float64)
    entries = {
        (1, 0, 1): (0.5, 0.5 * _SQRT3),
        (1, 1, 0): (0.5, -0.5 * _SQRT3),
        (0, 1, 0): (-0.5, -0.5 * _SQRT3),
        (0, 1, 1): (-1.0, 0.0),
        (0, 0, 1): (-0.5, 0.5 * _SQRT3),
    }
    for idx, (r, i) in entries.items():
        re[idx] = r
        im[idx] = i
    return re.astype(np.float32), im.astype(np.float32)


ROTATION_RE, ROTATION_IM = _build_rotation_table()


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
    return (jnp.asarray(T32) @ dq2albet(u_dq, eps).T).T


def abc2dq(u_abc, eps):
    """Three-phase abc -> DQ."""
    u_alpha_beta = jnp.asarray(T23) @ u_abc.T
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

    Treat the phasor ``(a, b)`` as ``a + b i``: identify its sector from the
    sign of ``sin(angle - k*120°)`` for ``k ∈ {0,1,2}``, rotate the sector
    onto the reference sector at the top of the hexagon, clip the rectangle
    covering that sector, and rotate back (reference ``pmsm_env.py:92-102``,
    with the complex multiplications expanded to real 2-D rotations).
    Input shape ``(2,)``, output shape ``(1, 2)``.
    """
    a = u_albet[0]
    b = u_albet[1]
    angle = jnp.arctan2(b, a)
    idx = (jnp.sin(angle[..., jnp.newaxis] - 2 / 3 * jnp.pi * jnp.arange(3)) >= 0).astype(int)
    rot_re = jnp.asarray(ROTATION_RE)[idx[0], idx[1], idx[2]]
    rot_im = jnp.asarray(ROTATION_IM)[idx[0], idx[1], idx[2]]
    # rotate sector upwards: (a + b i) * (rot_re + rot_im i)
    ra = a * rot_re - b * rot_im
    rb = a * rot_im + b * rot_re
    ra = jnp.clip(ra, -2 / 3, 2 / 3)
    rb = jnp.clip(rb, 0, 2 / 3 * jnp.sqrt(3))
    # rotate back: (ra + rb i) * conj(rot) = (ra + rb i) * (rot_re - rot_im i)
    oa = ra * rot_re + rb * rot_im
    ob = rb * rot_re - ra * rot_im
    return jnp.column_stack([oa, ob])


def clip_in_abc_coordinates(u_dq, u_dc, omega_el, eps, tau):
    """Clip DQ voltages phase-wise in abc coordinates and transform back."""
    eps_advanced = step_eps(eps, omega_el, tau, 0.5)
    u_abc = dq2abc(u_dq, eps_advanced)
    u_abc = jnp.clip(u_abc, -u_dc / 2.0, u_dc / 2.0)
    return abc2dq(u_abc, eps)
