"""Regular-grid lookup-table interpolation for saturated motor magnetics.

The reference interpolates six flux/inductance maps with
``jax.scipy.interpolate.RegularGridInterpolator`` after a host-side
nearest-neighbour NaN fill and constant edge padding
(``/root/reference/exciting_environments/pmsm/pmsm_env.py:316-363``).

TPU-native re-design: all six channels share one uniform grid, so they are
stacked into a single ``(C, nx, ny)`` array and interpolated with one fused
gather + bilinear blend (:class:`StackedBilinearLUT`).  Beyond the padded
edges the cell index clamps while the fractional weight keeps growing, which
yields exactly the linear extrapolation of ``RegularGridInterpolator`` with
``fill_value=None`` — and because the padded edge cells are constant, the
extrapolation is constant, matching the reference behavior.

Host-side preparation (:func:`fill_nan_nearest`, :func:`pad_edges`) runs once
at environment construction in NumPy; nothing here touches the device until
interpolation time.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def fill_nan_nearest(grid: np.ndarray) -> np.ndarray:
    """Replace NaNs by the value of the nearest (index-space) valid grid point.

    Pure-NumPy equivalent of the reference's ``scipy.interpolate.griddata``
    nearest fill over grid indices (``pmsm_env.py:333-340``).
    """
    grid = np.array(grid, dtype=np.float64, copy=True)
    nan_mask = np.isnan(grid)
    if not nan_mask.any():
        return grid
    valid_idx = np.argwhere(~nan_mask)
    nan_idx = np.argwhere(nan_mask)
    # small maps (<= ~53x28): exact brute-force nearest is cheap on host
    d2 = ((nan_idx[:, None, :] - valid_idx[None, :, :]) ** 2).sum(-1)
    nearest = valid_idx[np.argmin(d2, axis=1)]
    grid[nan_mask] = grid[nearest[:, 0], nearest[:, 1]]
    return grid


def pad_edges(grid: np.ndarray) -> np.ndarray:
    """Duplicate the border rows/columns once so linear extrapolation beyond
    the measured range becomes constant (``pmsm_env.py:342-346``)."""
    a = np.vstack([grid[0, :], grid, grid[-1, :]])
    return np.hstack([a[:, :1], a, a[:, -1:]])


def bilinear_gather(values, x0, dx, y0, dy, nx, ny, px, py):
    """Stacked bilinear gather of all ``C`` channels at point(s) ``(px, py)``.

    ``values`` has shape ``(C, nx, ny)``; ``px``/``py`` may be scalars or
    batched arrays (the gather broadcasts).  Indices clamp to the grid so
    out-of-range points extrapolate linearly from the edge cell — the
    semantics of ``jax.scipy`` ``RegularGridInterpolator`` on padded grids.
    This single implementation backs both the exact LUT path
    (:meth:`StackedBilinearLUT.interpolate_all`) and the trig-free PMSM fast
    rollout (:mod:`exciting_environments_tpu.ops.pmsm_fast`).
    """
    fx = (px - x0) / dx
    fy = (py - y0) / dy
    ix = jnp.clip(jnp.floor(fx), 0, nx - 2).astype(int)
    iy = jnp.clip(jnp.floor(fy), 0, ny - 2).astype(int)
    wx = fx - ix
    wy = fy - iy
    v00 = values[:, ix, iy]
    v01 = values[:, ix, iy + 1]
    v10 = values[:, ix + 1, iy]
    v11 = values[:, ix + 1, iy + 1]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * (1 - wx) * wy
        + v10 * wx * (1 - wy)
        + v11 * wx * wy
    )


class StackedBilinearLUT:
    """Bilinear interpolation of ``C`` channels sharing one uniform 2-D grid.

    Args:
        x: uniform grid along the first point coordinate, shape ``(nx,)``.
        y: uniform grid along the second point coordinate, shape ``(ny,)``.
        values: stacked channel maps, shape ``(C, nx, ny)``.
        channel_names: names addressing the leading axis.
    """

    def __init__(self, x: np.ndarray, y: np.ndarray, values: np.ndarray, channel_names):
        self.x0 = float(x[0])
        self.y0 = float(y[0])
        self.dx = float(x[1] - x[0])
        self.dy = float(y[1] - y[0])
        self.nx = int(len(x))
        self.ny = int(len(y))
        self.values = jnp.asarray(values)
        self.channel_names = tuple(channel_names)
        self._index = {n: i for i, n in enumerate(self.channel_names)}

    def interpolate_all(self, point):
        """Interpolate every channel at ``point`` (shape ``(2,)``); returns
        shape ``(C,)``.  One gather of 4 corners serves all channels."""
        return bilinear_gather(
            self.values, self.x0, self.dx, self.y0, self.dy, self.nx, self.ny, point[0], point[1]
        )

    def channel(self, name: str):
        """A callable ``point -> (1,)`` for one channel — signature-compatible
        with the reference's per-quantity ``LUT_interpolators[q]``."""
        idx = self._index[name]

        def interp(point):
            return self.interpolate_all(point)[idx][None]

        return interp

    def as_dict(self):
        """Dict of per-channel callables (reference-compatible API)."""
        return {name: self.channel(name) for name in self.channel_names}


SATURATED_QUANTITIES = ("L_dd", "L_dq", "L_qd", "L_qq", "Psi_d", "Psi_q")


def build_pmsm_lut(pmsm_lut: dict):
    """Prepare a raw measured LUT dict into a :class:`StackedBilinearLUT`.

    Mirrors the reference pipeline (``pmsm_env.py:316-363``): NaN fill, edge
    padding, and a uniform padded grid derived from ``i_d_vec``/``i_q_vec``.
    Returns ``(lut, processed_dict)`` where ``processed_dict`` holds the
    padded per-quantity maps (as the reference re-stores them).
    """
    i_d_vec = np.asarray(pmsm_lut["i_d_vec"], dtype=np.float64)
    i_q_vec = np.asarray(pmsm_lut["i_q_vec"], dtype=np.float64)
    i_d_min, i_d_max = i_d_vec.min(), i_d_vec.max()
    i_q_min, i_q_max = i_q_vec.min(), i_q_vec.max()
    i_d_step = (i_d_max - i_d_min) / (i_d_vec.shape[1] - 1)
    i_q_step = (i_q_max - i_q_min) / (i_q_vec.shape[1] - 1)

    processed = dict(pmsm_lut)
    padded = []
    for q in SATURATED_QUANTITIES:
        qmap = pad_edges(fill_nan_nearest(np.asarray(pmsm_lut[q], dtype=np.float64)))
        processed[q] = qmap
        padded.append(qmap.T)  # (nx=i_d, ny=i_q) orientation

    n_y, n_x = processed[SATURATED_QUANTITIES[0]].shape
    x = np.linspace(i_d_min - i_d_step, i_d_max + i_d_step, n_x)
    y = np.linspace(i_q_min - i_q_step, i_q_max + i_q_step, n_y)
    lut = StackedBilinearLUT(x, y, np.stack(padded), SATURATED_QUANTITIES)
    return lut, processed
