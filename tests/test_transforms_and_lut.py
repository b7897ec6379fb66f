"""Unit tests for the PMSM electrical transforms and LUT interpolation.

The hexagon constraint is checked against geometric ground truth (the result
must lie inside the hexagon and be idempotent), the Clarke/Park transforms
against their algebraic inverses, and the stacked bilinear interpolator
against ``jax.scipy``'s RegularGridInterpolator — the exact component the
reference uses (``pmsm_env.py:353``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from exciting_environments_tpu.ops.lut import (
    SATURATED_QUANTITIES,
    StackedBilinearLUT,
    build_pmsm_lut,
    fill_nan_nearest,
    pad_edges,
)
from exciting_environments_tpu.ops.transforms import (
    abc2dq,
    albet2dq,
    apply_hex_constraint,
    clip_in_abc_coordinates,
    dq2abc,
    dq2albet,
    step_eps,
)


# ----------------------------------------------------------------------
# reference-frame transforms
# ----------------------------------------------------------------------


def test_park_roundtrip():
    u = jnp.array([0.3, -0.7])
    for eps in [0.0, 0.5, -2.0, 3.0]:
        back = albet2dq(dq2albet(u, jnp.array(eps)), jnp.array(eps))
        np.testing.assert_allclose(np.asarray(back), np.asarray(u), atol=1e-6)


def test_clarke_roundtrip():
    u = jnp.array([0.4, 0.2])
    for eps in [0.1, -1.3]:
        abc = dq2abc(u, jnp.array(eps))
        assert abc.shape[-1] == 3
        # balanced three-phase: components sum to zero
        np.testing.assert_allclose(float(jnp.sum(abc)), 0.0, atol=1e-6)
        back = abc2dq(abc, jnp.array(eps))
        np.testing.assert_allclose(np.asarray(back).ravel(), np.asarray(u), atol=1e-6)


def test_step_eps_wraps():
    eps = step_eps(jnp.array(3.0), jnp.array(10.0), 0.1, 1.0)  # 3 + 1 = 4 -> wrap
    assert -np.pi < float(eps) <= np.pi
    np.testing.assert_allclose(float(eps), 4.0 - 2 * np.pi, atol=1e-6)


def _in_hexagon(a, b, tol=1e-5):
    """Point-in-hexagon check for the inverter hexagon in u_dc/2 units:
    circumradius 4/3 (active vectors 2/3*u_dc normalized by u_dc/2), flat
    edges at apothem 2*sqrt(3)/3 with normals at 90 deg + k*60 deg."""
    apothem = 2 * np.sqrt(3) / 3
    for k in range(6):
        ang = np.pi / 2 + k * np.pi / 3
        proj = a * np.cos(ang) + b * np.sin(ang)
        if proj > apothem + tol:
            return False
    return True


def test_hex_constraint_geometry():
    rng = np.random.default_rng(0)
    for _ in range(200):
        u = rng.uniform(-2.5, 2.5, size=2)
        out = np.asarray(apply_hex_constraint(jnp.array(u)))[0]
        assert _in_hexagon(out[0], out[1]), f"{u} -> {out} outside hexagon"
        # points already inside must be unchanged
        if _in_hexagon(u[0], u[1], tol=-1e-4):
            np.testing.assert_allclose(out, u, atol=1e-5)
        # idempotence
        out2 = np.asarray(apply_hex_constraint(jnp.array(out)))[0]
        np.testing.assert_allclose(out2, out, atol=1e-5)


def test_clip_in_abc():
    u = jnp.array([300.0, 300.0])
    clipped = clip_in_abc_coordinates(u, 400.0, jnp.array(100.0), jnp.array(0.3), 1e-4)
    assert np.all(np.isfinite(np.asarray(clipped)))


# ----------------------------------------------------------------------
# LUT interpolation
# ----------------------------------------------------------------------


def test_fill_nan_nearest():
    g = np.array([[1.0, np.nan], [np.nan, 4.0]])
    filled = fill_nan_nearest(g)
    assert not np.isnan(filled).any()
    assert filled[0, 0] == 1.0 and filled[1, 1] == 4.0
    assert filled[0, 1] in (1.0, 4.0)


def test_pad_edges_constant_border():
    g = np.arange(6.0).reshape(2, 3)
    p = pad_edges(g)
    assert p.shape == (4, 5)
    np.testing.assert_array_equal(p[0, 1:-1], g[0])
    np.testing.assert_array_equal(p[:, 0], p[:, 1])


@pytest.mark.slow
def test_stacked_bilinear_matches_jax_scipy():
    """Bilinear gather must agree with RegularGridInterpolator (linear,
    fill_value=None) inside the grid and on linear extrapolation outside."""
    rng = np.random.default_rng(1)
    x = np.linspace(-2.0, 3.0, 11)
    y = np.linspace(0.0, 4.0, 9)
    values = rng.normal(size=(3, 11, 9))
    lut = StackedBilinearLUT(x, y, values, ("a", "b", "c"))

    rgi = {
        name: jax.scipy.interpolate.RegularGridInterpolator(
            (x, y), values[i], method="linear", bounds_error=False, fill_value=None
        )
        for i, name in enumerate(("a", "b", "c"))
    }
    points = rng.uniform(-3.0, 5.0, size=(50, 2))  # includes out-of-grid points
    for p in points:
        got = np.asarray(lut.interpolate_all(jnp.array(p)))
        for i, name in enumerate(("a", "b", "c")):
            want = float(rgi[name](jnp.array([p]))[0])
            np.testing.assert_allclose(got[i], want, rtol=1e-10, atol=1e-10)


def test_build_pmsm_lut_brusa():
    from exciting_environments_tpu.models.pmsm.motor_parameters import MotorVariant

    params = MotorVariant.BRUSA.get_params()
    lut, processed = build_pmsm_lut(params.pmsm_lut)
    assert lut.values.shape[0] == len(SATURATED_QUANTITIES)
    # padded by one cell on each side
    assert processed["L_dd"].shape == (51 + 2, 26 + 2)
    # interpolation at a measured grid point reproduces the (padded) map value
    v = lut.interpolate_all(jnp.array([-100.0, 50.0]))
    assert np.all(np.isfinite(np.asarray(v)))
