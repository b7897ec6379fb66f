"""Trig-free fused Pallas PMSM rollout: the whole drive on-chip, streaming
only raw actions.

The exact kernel (:mod:`~exciting_environments_tpu.ops.pallas.pmsm_stepper`)
reproduces the scan path bit-for-bit, which forces the hexagon constraint
into an XLA pre-pass (its transcendentals must round like the scan's) and
streams the constrained voltage slab through HBM.  This kernel instead
applies the fast-math semantics of
:mod:`exciting_environments_tpu.ops.pmsm_fast` *inside* the kernel:

* the Park rotations at the deadtime-advanced angle carry ``(cos, sin)`` as
  state, advanced per step by one FMA rotation with the per-trajectory
  constants ``(cos(omega tau), sin(omega tau))`` and renormalized to first
  order — no per-step transcendentals at all;
* the hexagon sector bits are the exact linear cross-product sign tests of
  :func:`~exciting_environments_tpu.ops.pmsm_fast.hex_clip_fast`, and the
  sector rotation is the exact multilinear 0/1 combination of the rotation
  table;
* the magnetics are the linear model or the measured LUTs via the same
  same exact one-hot MXU gathers as the exact kernel (int8x4 byte planes
  by default, bf16x3 via gather="dot").

Everything except the action stream (8 bytes/env-step) stays in VMEM for
the whole horizon.  Accuracy matches the XLA fast path (identical
arithmetic): trajectories deviate from the exact path at the ~1e-5 level
over ~1000 float32 steps through the O(n ulp) rotation-carry drift — see
the ``ops.pmsm_fast`` docstring.  Scope mirrors
:func:`~exciting_environments_tpu.ops.pmsm_fast.pmsm_fast_rollout`:
scalar params, Euler solver, deadtime in {0, 1}, batch a multiple of 1024.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exciting_environments_tpu.ops.fastmath import wrap_angle_fast
from exciting_environments_tpu.ops.pallas.pmsm_stepper import (
    LANES,
    SUBLANES,
    _blend_channels,
    _gather_corners,
    _lut_operand,
    _round_up,
    _split_bf16x3,
    _split_int8x4,
    supports_pmsm_fused,
)
from exciting_environments_tpu.ops.pmsm_fast import _multilinear_table
from exciting_environments_tpu.ops.transforms import ROTATION_IM, ROTATION_RE

_S3H = float(np.sqrt(3.0) / 2.0)

_N_STATE = 6  # i_d, i_q, cA, sA, buf_d, buf_q


def _hex_clip_tiles(alpha, beta, dtype):
    """:func:`ops.pmsm_fast.hex_clip_fast` on (rows, 128) tiles."""
    b0 = (beta >= 0).astype(dtype)
    b1 = ((-0.5) * beta - _S3H * alpha >= 0).astype(dtype)
    b2 = ((-0.5) * beta + _S3H * alpha >= 0).astype(dtype)
    rot_re = _multilinear_table(ROTATION_RE, b0, b1, b2)
    rot_im = _multilinear_table(ROTATION_IM, b0, b1, b2)
    ra = alpha * rot_re - beta * rot_im
    rb = alpha * rot_im + beta * rot_re
    ra = jnp.clip(ra, -2.0 / 3.0, 2.0 / 3.0)
    rb = jnp.clip(rb, 0.0, float(2.0 / 3.0 * np.sqrt(3.0)))
    oa = ra * rot_re + rb * rot_im
    ob = rb * rot_re - ra * rot_im
    return oa, ob


def _make_kernel(chunk, saturated, consts, geom, gather):
    (tau, p15, r_s, inv_ld, inv_lq, l_d, l_q, psi_p, deadtime,
     a_scale_d, a_off_d, a_scale_q, a_off_q, to_halfdc, from_halfdc) = consts

    def lut_vals(V, i_d, i_q):
        corners, wx, wy = _gather_corners(V, i_d, i_q, geom, gather)
        return _blend_channels(corners, wx, wy)

    def kernel(a_ref, omega_ref, cd_ref, sd_ref, *refs):
        in_refs = refs[:_N_STATE]
        refs = refs[_N_STATE:]
        if saturated:
            V = refs[0][:]
            refs = refs[1:]
        else:
            V = None
        out_refs = refs[:_N_STATE]
        tq_out = refs[_N_STATE]
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            for ref, src in zip(out_refs, in_refs):
                ref[:] = src[:]

        omega = omega_ref[:]
        c_delta = cd_ref[:]
        s_delta = sd_ref[:]

        def body(i, y):
            i_d, i_q, cA, sA, buf_d, buf_q = y
            a = a_ref[i]
            u_d = a[0] * a_scale_d + a_off_d
            u_q = a[1] * a_scale_q + a_off_q
            nd = u_d * to_halfdc
            nq = u_q * to_halfdc
            alpha = cA * nd - sA * nq
            beta = sA * nd + cA * nq
            alpha, beta = _hex_clip_tiles(alpha, beta, i_d.dtype)
            ud_c = (cA * alpha + sA * beta) * from_halfdc
            uq_c = (-sA * alpha + cA * beta) * from_halfdc
            if deadtime > 0:
                u_app_d, u_app_q = buf_d, buf_q
                buf_d, buf_q = ud_c, uq_c
            else:
                u_app_d, u_app_q = ud_c, uq_c
            if saturated:
                l_dd, l_dq, l_qd, l_qq, psi_d, psi_q = lut_vals(V, i_d, i_q)
                det = l_dd * l_qq - l_dq * l_qd
                rhs_d = u_app_d - r_s * i_d + omega * psi_q
                rhs_q = u_app_q - r_s * i_q - omega * psi_d
                di_d = (l_qq * rhs_d - l_dq * rhs_q) / det
                di_q = (l_dd * rhs_q - l_qd * rhs_d) / det
            else:
                di_d = (u_app_d + omega * l_q * i_q - r_s * i_d) * inv_ld
                di_q = (u_app_q - omega * (l_d * i_d + psi_p) - r_s * i_q) * inv_lq
            i_d = i_d + tau * di_d
            i_q = i_q + tau * di_q
            # advance the carried rotation, first-order renormalization
            cA, sA = cA * c_delta - sA * s_delta, sA * c_delta + cA * s_delta
            r2 = cA * cA + sA * sA
            corr = 0.5 * (3.0 - r2)
            cA = cA * corr
            sA = sA * corr
            return (i_d, i_q, cA, sA, buf_d, buf_q)

        y = tuple(ref[:] for ref in out_refs)
        y = jax.lax.fori_loop(0, chunk, body, y)
        for ref, leaf in zip(out_refs, y):
            ref[:] = leaf
        i_d, i_q = y[0], y[1]
        if saturated:
            vals = lut_vals(V, i_d, i_q)
            tq_out[:] = p15 * (vals[4] * i_q - vals[5] * i_d)
        else:
            tq_out[:] = p15 * (psi_p + (l_d - l_q) * i_d) * i_q

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "saturated", "consts", "geom", "gather", "time_major", "interpret"),
)
def _fast_core(
    actions_norm, i_d0, i_q0, cA0, sA0, bd0, bq0, omega, vflat,
    n_steps: int, saturated: bool, consts: tuple, geom: tuple,
    gather: str, time_major: bool, interpret: bool,
):
    batch = i_d0.shape[0]
    total_rows = batch // LANES
    rows = SUBLANES
    n_batch_tiles = total_rows // rows

    itemsize = jnp.dtype(i_d0.dtype).itemsize
    max_chunk = max(1, (2 * 1024 * 1024) // (2 * rows * LANES * itemsize))
    chunk = 1
    for c in range(1, n_steps + 1):
        if n_steps % c == 0 and c <= max_chunk:
            chunk = c
    n_time_chunks = n_steps // chunk

    if time_major:
        a_tiled = jnp.transpose(actions_norm, (0, 2, 1)).reshape(n_steps, 2, total_rows, LANES)
    else:
        a_tiled = jnp.transpose(actions_norm, (1, 2, 0)).reshape(n_steps, 2, total_rows, LANES)

    dtype = i_d0.dtype
    state_block = lambda: pl.BlockSpec((rows, LANES), lambda b, k: (b, 0), memory_space=pltpu.VMEM)
    tile = lambda x: x.reshape(total_rows, LANES)

    in_specs = [
        pl.BlockSpec((chunk, 2, rows, LANES), lambda b, k: (k, 0, b, 0), memory_space=pltpu.VMEM),
        state_block(),  # omega
        state_block(),  # cos(omega tau)
        state_block(),  # sin(omega tau)
    ] + [state_block() for _ in range(_N_STATE)]
    operands = [a_tiled, tile(omega), tile(jnp.cos(omega * consts[0])), tile(jnp.sin(omega * consts[0]))]
    operands += [tile(x) for x in (i_d0, i_q0, cA0, sA0, bd0, bq0)]
    if saturated:
        zeros = (0,) * vflat.ndim
        in_specs.append(pl.BlockSpec(vflat.shape, lambda b, k, z=zeros: z, memory_space=pltpu.VMEM))
        operands.append(vflat)

    out_specs = [state_block() for _ in range(_N_STATE + 1)]
    out_shape = [jax.ShapeDtypeStruct((total_rows, LANES), dtype) for _ in range(_N_STATE + 1)]

    kernel = _make_kernel(chunk, saturated, consts, geom, gather)
    out = pl.pallas_call(
        kernel,
        grid=(n_batch_tiles, n_time_chunks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)
    return tuple(o.reshape(batch) for o in out)


def pmsm_fast_fused_rollout(
    env,
    init_state,
    actions_norm,
    time_major: bool = False,
    gather: str = "int8",
    interpret: bool = False,
):
    """Trig-free fused Pallas rollout of a PMSM drive.

    Same semantics and accuracy envelope as
    :func:`~exciting_environments_tpu.ops.pmsm_fast.pmsm_fast_rollout` (the
    XLA fast path), with the whole step — hexagon clip, deadtime buffering,
    LUT gather, Euler update, rotation carry — inside one kernel streaming
    only the raw normalized actions.  Returns the final batched ``State``.
    """
    from exciting_environments_tpu.core import structures
    from exciting_environments_tpu.ops.solvers import Euler

    props = env.env_properties
    params = props.static_params
    if not supports_pmsm_fused(env):
        raise ValueError("pmsm_fast_fused_rollout requires a fused-kernel-scope PMSM")
    if not all(
        np.isscalar(leaf)
        for leaf in jax.tree_util.tree_leaves(params)
        + jax.tree_util.tree_leaves(props.action_normalizations)
    ):
        raise ValueError(
            "pmsm_fast_fused_rollout folds all parameters into the program — "
            "per-batch heterogeneous fleets go through the exact fused kernel "
            "(pmsm_fused_rollout streams them as tile operands)"
        )
    if getattr(env, "_has_noise", False):
        raise ValueError(
            "pmsm_fast_fused_rollout integrates deterministically — stochastic "
            "drives go through the exact fused kernel or the scan"
        )
    if type(env._solver) is not Euler:
        raise ValueError("pmsm_fast_fused_rollout requires the Euler solver")
    saturated = bool(props.saturated)
    deadtime = int(params.deadtime)

    phys = init_state.physical_state
    dtype = jnp.asarray(phys.i_d).dtype
    n_steps = actions_norm.shape[0] if time_major else actions_norm.shape[1]
    an = props.action_normalizations
    f = float
    tau = f(env.tau)
    if saturated:
        lut = env._lut
        geom = (
            f(lut.x0), f(lut.dx), f(lut.y0), f(lut.dy),
            int(lut.nx), int(lut.ny),
            _round_up(lut.nx, SUBLANES), _round_up(lut.ny, SUBLANES),
        )
        if gather == "int8" and dtype == jnp.float32:
            vflat = jnp.asarray(_split_int8x4(_lut_operand(lut, np.float32)))
        elif gather == "dot" and dtype == jnp.float32:
            vflat = jnp.asarray(_split_bf16x3(_lut_operand(lut, np.float32)))
        else:
            vflat = jnp.asarray(_lut_operand(lut, dtype))
        l_d = l_q = 1.0
        psi_p = 0.0
    else:
        geom = None
        vflat = None
        l_d, l_q, psi_p = f(params.l_d), f(params.l_q), f(params.psi_p)

    consts = (
        tau,
        1.5 * f(params.p),
        f(params.r_s),
        1.0 / l_d,
        1.0 / l_q,
        l_d,
        l_q,
        psi_p,
        deadtime,
        f((an.u_d.max - an.u_d.min) / 2.0),
        f((an.u_d.max + an.u_d.min) / 2.0),
        f((an.u_q.max - an.u_q.min) / 2.0),
        f((an.u_q.max + an.u_q.min) / 2.0),
        f(2.0 / params.u_dc),
        f(params.u_dc / 2.0),
    )

    batch = env.batch_size
    bc = lambda v: jnp.broadcast_to(jnp.asarray(v, dtype), (batch,))
    eps0 = bc(phys.epsilon)
    omega = bc(phys.omega_el)
    adv0 = eps0 + (deadtime + 0.5) * tau * omega
    out = _fast_core(
        jnp.asarray(actions_norm),
        bc(phys.i_d), bc(phys.i_q),
        jnp.cos(adv0), jnp.sin(adv0),
        bc(phys.u_d_buffer), bc(phys.u_q_buffer),
        omega, vflat,
        n_steps=n_steps, saturated=saturated, consts=consts, geom=geom,
        gather=gather, time_major=time_major, interpret=interpret,
    )
    i_d, i_q, _, _, buf_d, buf_q, torque = out
    eps_final = wrap_angle_fast(eps0 + n_steps * (omega * tau))

    return structures.replace(
        init_state,
        physical_state=structures.replace(
            phys,
            i_d=i_d,
            i_q=i_q,
            epsilon=eps_final,
            torque=torque,
            u_d_buffer=buf_d,
            u_q_buffer=buf_q,
            omega_el=omega,
        ),
        additions=env.Additions(
            solver_state=None,
            active_solver_state=jnp.full(batch, True),
        ),
    )
