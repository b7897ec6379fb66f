"""Fast-math building blocks for rollout hot paths.

Profiling on the target TPU runtime shows a stark op-cost split inside
compiled loops: multiply/add/FMA and ``floor`` run at VPU peak
(~1e12 elem/s), while ``sin``/``exp``/``sqrt``/``rem``/``select`` fall onto a
slow path costing ~500x more per element.  The classic-mechanics
environments only need two "slow" primitives in their hot loops — ``sin``
and the (-pi, pi] angle wrap — and both have peak-speed equivalents:

* :func:`poly_sin` — odd Chebyshev-fit polynomial of ``sin`` on [-pi, pi]
  evaluated with a Horner scheme in ``x^2`` (pure FMA; max abs error ~1e-7,
  i.e. at the float32 rounding level of the exact op).
* :func:`wrap_angle_fast` — floored-modulo wrap computed as
  ``x - 2*pi*floor((x + pi) / (2*pi))``, mathematically identical to the
  reference's ``((x + pi) % (2*pi)) - pi`` (floored modulo) with rounding
  differences at the last ulp.

These are *opt-in* (``Pendulum(fast_math=True)``, the fast Pallas kernels):
the default paths keep exact ``jnp`` semantics so golden-fixture parity is
untouched.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_TWO_PI = 2.0 * np.pi


def _fit_sin_coeffs(degree: int = 15) -> np.ndarray:
    """Least-squares Chebyshev fit of sin on [-pi, pi], returned as the odd
    power-basis coefficients [c1, c3, c5, ...] (even terms vanish by parity)."""
    x = np.linspace(-np.pi, np.pi, 4096)
    cheb = np.polynomial.chebyshev.Chebyshev.fit(x, np.sin(x), degree, domain=[-np.pi, np.pi])
    poly = cheb.convert(kind=np.polynomial.Polynomial)
    coeffs = np.zeros(degree + 1)
    coeffs[: len(poly.coef)] = poly.coef
    return coeffs[1::2].astype(np.float32)  # odd powers only


_SIN_ODD_COEFFS = _fit_sin_coeffs()


def poly_sin(x):
    """Polynomial sin for ``x`` in [-pi, pi] (FMA-only; ~1e-7 max abs error)."""
    x2 = x * x
    acc = jnp.float32(_SIN_ODD_COEFFS[-1])
    for c in _SIN_ODD_COEFFS[-2::-1]:
        acc = acc * x2 + jnp.float32(c)
    return x * acc


def wrap_angle_fast(x):
    """Wrap to (-pi, pi] using only FMA + floor (no rem/select)."""
    return x - _TWO_PI * jnp.floor((x + np.pi) / _TWO_PI)


def poly_sin_max_error() -> float:
    """Max abs deviation of :func:`poly_sin` from ``np.sin`` on [-pi, pi]
    (float64 reference evaluation; useful for validation output)."""
    x = np.linspace(-np.pi, np.pi, 100001)
    x2 = x * x
    acc = np.float64(_SIN_ODD_COEFFS[-1])
    for c in _SIN_ODD_COEFFS[-2::-1]:
        acc = acc * x2 + np.float64(c)
    return float(np.max(np.abs(x * acc - np.sin(x))))


def sin_wrapped(x):
    """Polynomial sin for arbitrary arguments (one fast wrap + poly)."""
    return poly_sin(wrap_angle_fast(x))


def poly_cos(x):
    """Polynomial cos via the shifted sin identity (fast wrap + poly)."""
    return poly_sin(wrap_angle_fast(x + 0.5 * np.pi))


def fast_sign(x):
    """``sign`` without select: ``clip(x * 1e30, -1, 1)`` (min/max only).

    Matches ``jnp.sign`` exactly for 0 and any ``|x| >= 1e-30``; float32
    subnormal-magnitude inputs land strictly between -1 and 1, which the
    friction terms using this (Coulomb ``mu_c * sign(velocity)``) tolerate
    at fast-math accuracy.
    """
    x = jnp.asarray(x)
    return jnp.clip(x * jnp.asarray(1e30, x.dtype), -1.0, 1.0)
