"""Fused Pallas TPU rollout kernel: an entire multi-step environment rollout
inside one kernel launch.

Motivation (SURVEY §7.7): the XLA ``lax.scan`` rollout
(:meth:`CoreEnvironment.vmap_rollout`) already removes per-step dispatch, but
every scan iteration still round-trips the state through HBM with generic
layouts.  This kernel keeps the state *resident in VMEM* for the whole
horizon on a 2-D grid: batch tiles (up to 64x128 rows) on the outer axis and
double-buffered ~2 MB action chunks streaming on the inner (time) axis, with
the state carried in the revisited output block.  The horizon length is
therefore unbounded by VMEM, and for small-state environments (pendulum:
2 floats/env) the only unavoidable HBM traffic is streaming the actions.

Scope: the classic ODE environments (elementwise vector fields) with any
explicit Runge-Kutta solver — including FSAL methods (Tsit5/Dopri5) — and
scalar OR per-batch ``(batch,)`` heterogeneous static parameters (streamed
as per-tile operands).  Two execution semantics:

* **step mode** (:func:`env_fused_rollout`): identical to repeated
  ``vmap_step`` calls.  FSAL methods re-initialize their carry against the
  current action every step (the reference's net behavior, see
  ``solvers.py``), so the last FSAL stage never feeds the update and the
  kernel simply evaluates stages 1..s-1; the final state's solver carry is
  reconstructed afterwards.
* **sim-ahead mode** (:func:`env_fused_sim_ahead`): identical to
  ``vmap_sim_ahead`` for ``obs_stepsize == action_stepsize``.  The carry is
  NOT angle-wrapped/clipped between steps (the reference wraps only the
  saved trajectory, ``core/env.py::_ode_solver_simulate_ahead``), and
  stages at ``c == 1.0`` read the NEXT action — the documented
  future-action ZOH semantics of multistage solvers (reference
  ``core_env.py:435-439``), realized by streaming a one-slot-shifted copy
  of the action slab.

The PMSM (LUT gathers, deadtime buffers) has its own fused kernel
(:mod:`~exciting_environments_tpu.ops.pallas.pmsm_stepper`); unsupported
configurations transparently fall back to the XLA scan path.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exciting_environments_tpu.core.env import CoreEnvironment
from exciting_environments_tpu.ops.fastmath import wrap_angle_fast
from exciting_environments_tpu.ops.solvers import ExplicitRungeKutta

# one batch tile = (SUBLANES, LANES) = 1024 environments (f32 native tiling)
LANES = 128
SUBLANES = 8
TILE = LANES * SUBLANES


class _IndexableAction:
    """Adapter so env ODEs can index the action (``action(t)[dim]``) while the
    kernel holds one (8, 128) tile per action dimension."""

    def __init__(self, leaves):
        self._leaves = leaves

    def __getitem__(self, i):
        return self._leaves[i]


def _stage_rows(solver: ExplicitRungeKutta):
    """Stage matrix rows and output weights actually needed for ``y1``.

    For FSAL methods the last stage equals ``f(t1, y1)`` and carries zero
    output weight — it only seeds the *next* step's first stage, and both
    step mode (per-step re-init) and sim-ahead mode recompute it, so the
    kernel skips it entirely.
    """
    if solver.fsal:
        return solver.a[:-1], solver.b[:-1]
    return solver.a, solver.b


def _rk_step(ode, solver: ExplicitRungeKutta, y, action, tau, t, action_next=None):
    """One explicit RK step on a tuple of (8, 128) tiles.

    Coefficient handling mirrors ``solvers._weighted_increment`` (skip zero
    terms, no multiply for unit coefficients) so Euler is exactly
    ``y + tau * f`` — bit-identical to the XLA step path.  With
    ``action_next`` given (sim-ahead mode), stages at ``c == 1.0`` evaluate
    under the next action — the ZOH lookup of ``ops.rollout.zoh_action``
    lands on the following interval there (guarded floor division).
    """

    def lincomb(yl, ks_for_leaf, coeffs):
        acc = None
        for c, k in zip(coeffs, ks_for_leaf):
            if c == 0.0:
                continue
            term = k if c == 1.0 else c * k
            acc = term if acc is None else acc + term
        return yl if acc is None else yl + tau * acc

    a_rows, b = _stage_rows(solver)
    ks = [ode(t, y, action)]
    for row, c in zip(a_rows, solver.c[1:]):
        ti = t if c == 0.0 else t + c * tau
        act_i = action_next if (action_next is not None and c == 1.0) else action
        yi = tuple(
            lincomb(yl, [k[j] for k in ks], row) for j, yl in enumerate(y)
        )
        ks.append(ode(ti, yi, act_i))
    return tuple(lincomb(yl, [k[j] for k in ks], b) for j, yl in enumerate(y))


def _needs_next_action(solver: ExplicitRungeKutta) -> bool:
    """Whether any update-relevant stage sits at ``c == 1.0`` (sim-ahead
    future-action access)."""
    a_rows, _ = _stage_rows(solver)
    return any(c == 1.0 for c in solver.c[1 : len(a_rows) + 1])


def _make_kernel(
    ode, solver, chunk, n_state, n_action, n_params, tau, wrap_flags, clip_fn,
    traj_stride, fast_wrap, has_next, carry_postprocess, noise_idx=(),
):
    """Kernel body over refs ``(actions[, actions_next][, noise], *params,
    *state_in, *state_out[, *traj_out])``.

    With ``noise_idx`` set (stochastic step mode), a pre-scaled
    Euler–Maruyama increment slab streams alongside the actions and is added
    to the indexed state leaves after the deterministic wrap/clip, followed
    by a second wrap/clip — the exact operation order of
    ``CoreEnvironment._apply_process_noise``.

    The grid is ``(batch_tiles, time_chunks)`` with time innermost: the state
    output block (constant over the time axis) doubles as the carried state —
    it is initialized from the input block on the first chunk and revisited
    by every later chunk of the same batch tile, while Pallas double-buffers
    the per-chunk action DMA.  With ``traj_stride`` set, every
    ``traj_stride``-th post-step state is also written to per-leaf trajectory
    blocks of ``chunk // traj_stride`` rows.  ``carry_postprocess`` applies
    wrap/clip to the carried state each step (step mode); sim-ahead mode
    disables it and saves raw values (the caller wraps the saves).
    """

    def kernel(actions_ref, *refs):
        if has_next:
            actions_next_ref = refs[0]
            refs = refs[1:]
        else:
            actions_next_ref = None
        if noise_idx:
            noise_ref = refs[0]
            refs = refs[1:]
        param_refs = refs[:n_params]
        refs = refs[n_params:]
        in_refs = refs[:n_state]
        state_refs = refs[n_state : 2 * n_state]
        traj_refs = refs[2 * n_state :]
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            for ref, src in zip(state_refs, in_refs):
                ref[:] = src[:]

        params = tuple(ref[:] for ref in param_refs)

        def body(i, y):
            action = _IndexableAction(tuple(actions_ref[i, a] for a in range(n_action)))
            action_next = (
                _IndexableAction(tuple(actions_next_ref[i, a] for a in range(n_action)))
                if has_next
                else None
            )
            step = k * chunk + i
            y1 = _rk_step(
                lambda t, yy, act: ode(t, yy, act, params),
                solver, y, action, tau, step * tau, action_next=action_next,
            )
            if carry_postprocess:
                wrap_op = wrap_angle_fast if fast_wrap else (
                    lambda leaf: ((leaf + jnp.pi) % (2 * jnp.pi)) - jnp.pi
                )
                y1 = tuple(
                    wrap_op(leaf) if wrap else leaf for leaf, wrap in zip(y1, wrap_flags)
                )
                if clip_fn is not None:
                    y1 = clip_fn(y1)
            if noise_idx:
                y1 = list(y1)
                for j, idx in enumerate(noise_idx):
                    y1[idx] = y1[idx] + noise_ref[i, j]
                y1 = tuple(
                    wrap_op(leaf) if wrap else leaf for leaf, wrap in zip(y1, wrap_flags)
                )
                if clip_fn is not None:
                    y1 = clip_fn(y1)
            if traj_stride is not None:
                if traj_stride <= chunk:
                    # >= 1 save per chunk: slot indexed within the block
                    @pl.when((i + 1) % traj_stride == 0)
                    def _():
                        slot = (i + 1) // traj_stride - 1
                        for ref, leaf in zip(traj_refs, y1):
                            ref[slot] = leaf
                else:
                    # one save every traj_stride // chunk chunks: the block
                    # holds a single slot, revisited until its save step
                    @pl.when((step + 1) % traj_stride == 0)
                    def _():
                        for ref, leaf in zip(traj_refs, y1):
                            ref[0] = leaf

            return y1

        y = tuple(ref[:] for ref in state_refs)
        y = jax.lax.fori_loop(0, chunk, body, y)
        for ref, leaf in zip(state_refs, y):
            ref[:] = leaf

    return kernel


def _launch(
    ode,
    solver: ExplicitRungeKutta,
    y0: tuple,
    actions,
    n_steps: int,
    tau: float,
    wrap_flags: tuple,
    clip_fn=None,
    traj_stride: int = None,
    fast_wrap: bool = False,
    time_major: bool = False,
    param_leaves: tuple = (),
    sim_ahead: bool = False,
    interpret: bool = False,
    noise_tm=None,
    noise_idx: tuple = (),
):
    """Tile the operands and launch the Pallas kernel (primal computation of
    :func:`fused_rollout`; see there for the argument contract).

    Args:
        ode: ``ode(t, y_tuple, indexable_action, param_tiles) -> dy_tuple``,
            elementwise on (8, 128) tiles; scalar parameters closed over as
            Python scalars, per-batch parameters arriving as ``param_tiles``.
        solver: :class:`ExplicitRungeKutta` (tableau baked into the kernel;
            FSAL methods supported — their final stage is carry-only and
            skipped, see :func:`_stage_rows`).
        y0: tuple of ``(B,)`` state arrays, ``B % 1024 == 0``.
        actions: physical (denormalized) actions, shape ``(B, n_steps, A)``
            — or ``(n_steps, B, A)`` with ``time_major=True``, which is the
            layout the kernel streams: for ``A == 1`` it is consumed with NO
            copy, while batch-major input costs a full transposed copy of
            the slab per call (the dominant cost at large ``B*n_steps``).
        n_steps: number of control steps (static).
        tau: step duration (static).
        wrap_flags: per-leaf flags — wrap into (-pi, pi] after each step.
        clip_fn: optional post-step saturation on the state tuple.
        traj_stride: if set, additionally return every ``traj_stride``-th
            post-step state, shape ``(B, n_steps // traj_stride)`` per leaf
            (static; must divide ``n_steps``).
        fast_wrap: wrap angles with the FMA+floor floored-modulo identity
            instead of ``rem`` (fast-math environments; last-ulp rounding
            differences).
        param_leaves: per-batch heterogeneous parameters, tuple of ``(B,)``
            arrays forwarded to ``ode`` as (rows, 128) tiles.
        sim_ahead: trajectory-solve semantics — the carry is not
            wrapped/clipped between steps (saves are raw; the caller wraps),
            and ``c == 1.0`` stages read the next action.
        interpret: Pallas interpreter mode (for CPU testing).
        noise_tm: optional pre-scaled process-noise increments, time-major
            ``(n_steps, B, len(noise_idx))`` — streamed like a second action
            slab and added to the ``noise_idx``-indexed state leaves each
            step (step mode only; the precompute lives in
            :func:`env_fused_rollout`).
        noise_idx: static indices into the state tuple receiving noise.

    Returns:
        tuple of ``(B,)`` final state arrays; with ``traj_stride`` set, a pair
        ``(final_tuple, traj_tuple)`` where each trajectory leaf has shape
        ``(B, n_steps // traj_stride)``.
    """
    batch = y0[0].shape[0]
    if batch % TILE != 0:
        raise ValueError(f"batch {batch} must be a multiple of {TILE}")
    if traj_stride is not None and n_steps % traj_stride != 0:
        raise ValueError("n_steps must be divisible by traj_stride")
    if (noise_tm is not None) != bool(noise_idx):
        raise ValueError("noise_tm and noise_idx must be set together")
    if noise_idx and sim_ahead:
        raise ValueError("process noise is step-mode only (sim_ahead integrates deterministically)")
    if noise_tm is not None and noise_tm.shape != (n_steps, batch, len(noise_idx)):
        raise ValueError(
            f"noise_tm must be (n_steps, B, n_noise) = {(n_steps, batch, len(noise_idx))}, "
            f"got {noise_tm.shape}"
        )
    n_state = len(y0)
    n_params = len(param_leaves)
    n_action = actions.shape[-1]
    if time_major and actions.shape[:2] != (n_steps, batch):
        raise ValueError(f"time_major actions must be (n_steps, B, A), got {actions.shape}")
    total_rows = batch // LANES

    # batch tile: as many (x, 128) rows as fit a ~1 MB/leaf VMEM budget
    rows = SUBLANES
    while rows * 2 <= total_rows and total_rows % (rows * 2) == 0 and rows < 64:
        rows *= 2
    n_batch_tiles = total_rows // rows

    has_next = sim_ahead and _needs_next_action(solver)

    # time chunk: largest divisor of n_steps keeping the STREAMED blocks
    # (action slab + optional noise slab — Pallas double-buffers both)
    # <= ~2 MB, compatible with the trajectory stride, AND with the TOTAL
    # double-buffered block set (streams incl. the shifted next-action
    # stream, plus the per-leaf trajectory save blocks) under the ~16 MB
    # scoped-VMEM ceiling with margin — without the last constraint a
    # trajectory-dense config (many saves per chunk x n_state leaves)
    # passes the stream budget yet OOMs Mosaic's kernel stack at compile
    # time (seen at b=65536, n_steps=64, stride 1, Tsit5 sim-ahead)
    streamed_width = n_action + len(noise_idx)
    itemsize = jnp.asarray(y0[0]).dtype.itemsize  # f64 in interpret runs
    max_chunk = max(1, (2 * 1024 * 1024) // (streamed_width * rows * LANES * itemsize))
    stream_blocks = n_action * (2 if has_next else 1) + len(noise_idx)

    def _scoped_block_bytes(c):
        width = stream_blocks * c
        if traj_stride is not None:
            width += max(1, c // traj_stride) * n_state
        return 2 * width * rows * LANES * itemsize  # x2: Pallas double-buffers

    chunk = 1
    for c in range(1, n_steps + 1):
        if (
            n_steps % c == 0
            and c <= max_chunk
            and (traj_stride is None or c % traj_stride == 0 or traj_stride % c == 0)
            and _scoped_block_bytes(c) <= 12 * 1024 * 1024
        ):
            chunk = c
    if traj_stride is not None and chunk % traj_stride != 0 and traj_stride % chunk != 0:
        raise ValueError("no time chunk compatible with traj_stride; use a smaller stride")
    n_time_chunks = n_steps // chunk

    # batch laid out as (rows, 128); actions time-major (T, A, rows, 128)
    y0_tiled = tuple(leaf.reshape(total_rows, LANES) for leaf in y0)
    if time_major:
        # (T, B, A): a pure reshape for A == 1, a last-two-dims transpose else
        if n_action == 1:
            actions_tiled = actions.reshape(n_steps, 1, total_rows, LANES)
        else:
            actions_tiled = jnp.transpose(actions, (0, 2, 1)).reshape(
                n_steps, n_action, total_rows, LANES
            )
    else:
        actions_tiled = jnp.transpose(actions, (1, 2, 0)).reshape(n_steps, n_action, total_rows, LANES)

    kernel = _make_kernel(
        ode, solver, chunk, n_state, n_action, n_params, tau, wrap_flags, clip_fn,
        traj_stride, fast_wrap, has_next, carry_postprocess=not sim_ahead,
        noise_idx=noise_idx,
    )

    def state_block():
        # constant over the time axis: the output block carries the state
        # across time chunks of the same batch tile
        return pl.BlockSpec((rows, LANES), lambda b, k: (b, 0), memory_space=pltpu.VMEM)

    def action_block():
        return pl.BlockSpec(
            (chunk, n_action, rows, LANES), lambda b, k: (k, 0, b, 0), memory_space=pltpu.VMEM
        )

    dtype = y0_tiled[0].dtype
    in_specs = [action_block()]
    operands = [actions_tiled]
    if has_next:
        # one-slot-shifted action stream for c == 1.0 stages; the final step
        # repeats the last action (the ZOH gather clamps at the end)
        in_specs.append(action_block())
        operands.append(jnp.concatenate([actions_tiled[1:], actions_tiled[-1:]], axis=0))
    if noise_idx:
        n_noise = len(noise_idx)
        if n_noise == 1:
            noise_tiled = noise_tm.reshape(n_steps, 1, total_rows, LANES)
        else:
            noise_tiled = jnp.transpose(noise_tm, (0, 2, 1)).reshape(
                n_steps, n_noise, total_rows, LANES
            )
        in_specs.append(
            pl.BlockSpec(
                (chunk, n_noise, rows, LANES), lambda b, k: (k, 0, b, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(noise_tiled)
    for leaf in param_leaves:
        in_specs.append(state_block())
        operands.append(jnp.asarray(leaf).reshape(total_rows, LANES))
    in_specs += [state_block() for _ in range(n_state)]
    operands += list(y0_tiled)

    out_specs = [state_block() for _ in range(n_state)]
    out_shape = [jax.ShapeDtypeStruct((total_rows, LANES), dtype) for _ in range(n_state)]
    if traj_stride is not None:
        n_saves = n_steps // traj_stride
        if traj_stride <= chunk:
            saves_per_chunk = chunk // traj_stride
            traj_index = lambda b, k: (k, b, 0)
        else:
            # the single-slot block is revisited until the chunk containing
            # its save step writes it (same revisiting idea as the state carry)
            saves_per_chunk = 1
            traj_index = lambda b, k: ((k * chunk) // traj_stride, b, 0)
        out_specs += [
            pl.BlockSpec(
                (saves_per_chunk, rows, LANES), traj_index, memory_space=pltpu.VMEM
            )
            for _ in range(n_state)
        ]
        out_shape += [
            jax.ShapeDtypeStruct((n_saves, total_rows, LANES), dtype) for _ in range(n_state)
        ]

    out = pl.pallas_call(
        kernel,
        grid=(n_batch_tiles, n_time_chunks),  # time innermost: state accumulates per tile
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)

    final = tuple(o.reshape(batch) for o in out[:n_state])
    if traj_stride is None:
        return final
    n_saves = n_steps // traj_stride
    traj = tuple(jnp.moveaxis(o.reshape(n_saves, batch), 0, 1) for o in out[n_state:])
    return final, traj


# ---------------------------------------------------------------------------
# Differentiability: custom VJP with checkpointed recompute
#
# pallas_call defines no transpose rule, so the raw kernel breaks under
# jax.grad — while every path of the reference is differentiable by
# construction (plain diffrax/JAX, e.g. reference pendulum_env.py:184).  The
# scheme here restores that capability on the fused path at kernel speed:
#
# * primal: the kernel, untouched (zero overhead when not differentiated);
# * forward-for-grad: ONE kernel launch that additionally saves every
#   ``ckpt``-th carried state (the strided-trajectory machinery) — when the
#   caller wants a trajectory at ``traj_stride``, ``ckpt`` divides it and the
#   user trajectory is a slice of the checkpoint stream, so there is still
#   only one launch;
# * backward: segment-by-segment reverse sweep — each length-``ckpt`` segment
#   is recomputed from its checkpoint with the *differentiable* plain-JAX
#   step (the same ``_rk_step``/wrap/clip arithmetic the kernel runs) and
#   pulled back with ``jax.vjp``.  Memory is O(B * (n_steps/ckpt + ckpt));
#   ``ckpt ~ sqrt(n_steps)`` balances the two terms.
# ---------------------------------------------------------------------------


class _RowAction:
    """Adapter indexing an ``(B, A)`` action row like the kernel's per-dim
    tiles (``action[dim] -> (B,)``)."""

    def __init__(self, row):
        self._row = row

    def __getitem__(self, i):
        return self._row[:, i]


def _ckpt_stride(n_steps: int, traj_stride) -> int:
    """Checkpoint interval of the backward sweep: the divisor of
    ``traj_stride`` (or ``n_steps``) minimizing ``n_steps/d + d`` — the sum
    of kernel-side checkpoint saves and per-segment recompute length.

    The divisor constraint keeps segments equal (the backward scan reshapes
    the action slab to ``(n_seg, ckpt, ...)``) and, with a trajectory, makes
    the user's save grid a slice of the checkpoint stream.  Horizons whose
    strides have no divisor near ``sqrt(n_steps)`` (e.g. a prime
    ``n_steps``) degrade toward checkpoint-every-step or one whole-horizon
    segment — pick composite horizons (powers of two are ideal) when
    differentiating very long rollouts."""
    base = traj_stride if traj_stride is not None else n_steps
    divisors = set()
    for d in range(1, int(base**0.5) + 1):
        if base % d == 0:
            divisors.update((d, base // d))
    # tie-break on the smaller divisor — matches the old ascending full
    # enumeration, and this runs at trace time on every grad trace
    return min(divisors, key=lambda d: (n_steps / d + d, d))


def _streamed_cl_chunk(n_steps, traj_stride, rows, itemsize, streamed_width, n_traj_leaves):
    """Time-chunk length of a closed-loop launch with STREAMED noise slabs:
    the largest divisor of ``n_steps`` (compatible with ``traj_stride``)
    keeping the double-buffered streamed blocks <= ~2 MB and the total
    scoped block set under the ~16 MB VMEM ceiling with margin.  Shared by
    the generic and PMSM closed-loop launchers so their budgeting never
    diverges (same contract as :func:`_traj_chunk` for the unstreamed
    case); enumerates divisors in O(sqrt(n_steps)) — the former linear
    scan was visible at trace time for million-step loops."""
    max_chunk = max(1, (2 * 1024 * 1024) // (streamed_width * rows * LANES * itemsize))

    def scoped(c):
        width = streamed_width * c
        if traj_stride is not None:
            width += (c // traj_stride) * n_traj_leaves
        return 2 * width * rows * LANES * itemsize

    divisors = sorted(
        d
        for i in range(1, int(n_steps**0.5) + 1)
        if n_steps % i == 0
        for d in (i, n_steps // i)
    )
    chunk = 0
    for c in divisors:
        if (
            c <= max_chunk
            and (traj_stride is None or c % traj_stride == 0)
            and scoped(c) <= 12 * 1024 * 1024
        ):
            chunk = c
    if chunk == 0:
        raise ValueError(
            "no time chunk fits the streamed noise slabs and trajectory "
            "blocks under the VMEM budget; use a smaller traj stride"
        )
    return chunk


def _traj_chunk(n_steps: int, traj_stride, rows: int, itemsize: int,
                n_traj_leaves: int = 1) -> int:
    """Time-chunk length of a closed-loop launch: the largest multiple of
    ``traj_stride`` dividing ``n_steps`` whose TOTAL double-buffered
    trajectory block set (``n_traj_leaves`` leaves of ``saves x rows x
    LANES``, x2 for double buffering) stays within ~10 MB of the ~16 MB
    scoped-VMEM ceiling — shared by the generic and PMSM closed-loop
    launchers so their budgeting never diverges.  (Round 5: budgeting the
    SET, not 2 MB per leaf — four leaves at the per-leaf budget overflowed
    Mosaic's kernel stack by 448 KB at b=65,536 x T=512, obs_stride=1.)
    ``traj_stride`` itself always qualifies (saves-per-chunk 1), so the
    search cannot come up empty; the whole horizon when no trajectory is
    streamed."""
    if traj_stride is None:
        return n_steps
    per_save = 2 * max(1, n_traj_leaves) * rows * LANES * itemsize
    max_saves = max(1, (10 * 1024 * 1024) // per_save)
    chunk = traj_stride
    for c in range(traj_stride, n_steps + 1, traj_stride):
        if n_steps % c == 0 and c // traj_stride <= max_saves:
            chunk = c
    return chunk


_N_STATIC = 12  # leading non-differentiable config args of _fused_core


@functools.partial(jax.custom_vjp, nondiff_argnums=tuple(range(_N_STATIC)))
def _fused_core(
    ode, solver, n_steps, tau, wrap_flags, clip_fn, traj_stride, fast_wrap,
    time_major, sim_ahead, interpret, noise_idx, y0, actions, param_leaves, noise_tm,
):
    return _launch(
        ode, solver, y0, actions, n_steps, tau, wrap_flags, clip_fn=clip_fn,
        traj_stride=traj_stride, fast_wrap=fast_wrap, time_major=time_major,
        param_leaves=param_leaves, sim_ahead=sim_ahead, interpret=interpret,
        noise_tm=noise_tm, noise_idx=noise_idx,
    )


def _plain_step(
    ode, solver, tau, wrap_flags, clip_fn, fast_wrap, sim_ahead, params, has_next,
    noise_idx=(),
):
    """The kernel's per-step computation in plain (differentiable) JAX,
    elementwise over ``(B,)`` state leaves.  With ``noise_idx`` set the step
    additionally takes the pre-scaled noise row ``(B, n_noise)`` and applies
    it with the kernel's exact wrap/clip ordering."""

    def step(y, a_row, a_next_row, t, dn_row=None):
        action = _RowAction(a_row)
        action_next = _RowAction(a_next_row) if has_next else None
        y1 = _rk_step(
            lambda tt, yy, act: ode(tt, yy, act, params),
            solver, y, action, tau, t, action_next=action_next,
        )
        if not sim_ahead:
            wrap_op = wrap_angle_fast if fast_wrap else (
                lambda leaf: ((leaf + jnp.pi) % (2 * jnp.pi)) - jnp.pi
            )
            y1 = tuple(
                wrap_op(leaf) if wrap else leaf for leaf, wrap in zip(y1, wrap_flags)
            )
            if clip_fn is not None:
                y1 = clip_fn(y1)
            if noise_idx:
                y1 = list(y1)
                for j, idx in enumerate(noise_idx):
                    y1[idx] = y1[idx] + dn_row[:, j]
                y1 = tuple(
                    wrap_op(leaf) if wrap else leaf for leaf, wrap in zip(y1, wrap_flags)
                )
                if clip_fn is not None:
                    y1 = clip_fn(y1)
        return y1

    return step


def _fused_core_fwd(
    ode, solver, n_steps, tau, wrap_flags, clip_fn, traj_stride, fast_wrap,
    time_major, sim_ahead, interpret, noise_idx, y0, actions, param_leaves, noise_tm,
):
    ckpt = _ckpt_stride(n_steps, traj_stride)
    final, saves = _launch(
        ode, solver, y0, actions, n_steps, tau, wrap_flags, clip_fn=clip_fn,
        traj_stride=ckpt, fast_wrap=fast_wrap, time_major=time_major,
        param_leaves=param_leaves, sim_ahead=sim_ahead, interpret=interpret,
        noise_tm=noise_tm, noise_idx=noise_idx,
    )
    if traj_stride is None:
        out = final
    else:
        skip = traj_stride // ckpt
        out = (final, tuple(s[:, skip - 1 :: skip] for s in saves))
    return out, (y0, actions, param_leaves, noise_tm, saves)


def _fused_core_bwd(
    ode, solver, n_steps, tau, wrap_flags, clip_fn, traj_stride, fast_wrap,
    time_major, sim_ahead, interpret, noise_idx, res, g,
):
    y0, actions, param_leaves, noise_tm, saves = res
    batch = y0[0].shape[0]
    n_action = actions.shape[-1]
    ckpt = _ckpt_stride(n_steps, traj_stride)
    n_seg = n_steps // ckpt
    has_next = sim_ahead and _needs_next_action(solver)

    if traj_stride is None:
        g_final = g
        g_traj = None
    else:
        g_final, g_traj = g

    acts_tm = actions if time_major else jnp.transpose(actions, (1, 0, 2))  # (T, B, A)

    # segment start states: y0 plus every checkpoint but the last, (S, B)/leaf
    starts = tuple(
        jnp.concatenate([jnp.asarray(leaf0)[None], jnp.moveaxis(s[:, :-1], 1, 0)], axis=0)
        for leaf0, s in zip(y0, saves)
    )
    acts_seg = acts_tm.reshape(n_seg, ckpt, batch, n_action)
    if has_next:
        # only c == 1.0 sim-ahead stages read the next interval's action —
        # the shifted slab (a full second copy of the actions) is built and
        # scanned only then
        acts_next_tm = jnp.concatenate([acts_tm[1:], acts_tm[-1:]], axis=0)
        acts_next_seg = acts_next_tm.reshape(n_seg, ckpt, batch, n_action)
    ts_seg = (np.arange(n_steps, dtype=np.float64) * tau).reshape(n_seg, ckpt)
    ts_seg = jnp.asarray(ts_seg, dtype=acts_tm.dtype)

    # trajectory cotangents scattered onto their segments ((S, B)/leaf): the
    # segment END state is the save, so its cotangent simply adds to the
    # carry cotangent entering that segment's pull-back
    if g_traj is not None:
        skip = traj_stride // ckpt
        g_save_seg = tuple(
            jnp.zeros((n_seg, batch), dtype=leaf.dtype)
            .at[skip - 1 :: skip]
            .set(jnp.moveaxis(leaf, 1, 0))
            for leaf in g_traj
        )
    else:
        g_save_seg = tuple(
            jnp.zeros((n_seg, batch), dtype=jnp.asarray(leaf).dtype) for leaf in y0
        )

    has_noise = bool(noise_idx)
    if has_noise:
        noise_seg = noise_tm.reshape(n_seg, ckpt, batch, len(noise_idx))

    def seg_apply(y_start, a_seg, an_seg, dn_seg, t_seg, params):
        inner = _plain_step(
            ode, solver, tau, wrap_flags, clip_fn, fast_wrap, sim_ahead, params,
            has_next, noise_idx=noise_idx,
        )

        def body(y, xs):
            a, an, dn, t = xs
            return inner(y, a, an, t, dn), None

        y_end, _ = jax.lax.scan(body, y_start, (a_seg, an_seg, dn_seg, t_seg))
        return y_end

    g_params0 = tuple(jnp.zeros_like(jnp.asarray(p)) for p in param_leaves)

    def bwd_body(carry, xs):
        g_y, g_params = carry
        start_s, a_s, t_s, g_save_s = xs["start"], xs["a"], xs["t"], xs["gs"]
        # streams absent from this configuration alias the action segment —
        # _plain_step never reads them then, so their cotangents are dead
        an_s = xs["an"] if has_next else a_s
        dn_s = xs["dn"] if has_noise else a_s
        g_y = tuple(gy + gs for gy, gs in zip(g_y, g_save_s))
        _, vjp_fn = jax.vjp(
            lambda y, a, an, dn, p: seg_apply(y, a, an, dn, t_s, p),
            start_s, a_s, an_s, dn_s, param_leaves,
        )
        gy_in, ga, gan, gdn, gp = vjp_fn(g_y)
        g_params = tuple(acc + gpl for acc, gpl in zip(g_params, gp))
        outs = {"ga": ga}
        if has_next:
            outs["gan"] = gan
        if has_noise:
            outs["gdn"] = gdn
        return (gy_in, g_params), outs

    xs = {"start": starts, "a": acts_seg, "t": ts_seg, "gs": g_save_seg}
    if has_next:
        xs["an"] = acts_next_seg
    if has_noise:
        xs["dn"] = noise_seg
    (g_y0, g_params), g_out = jax.lax.scan(
        bwd_body, (g_final, g_params0), xs, reverse=True
    )

    if has_next:
        ga_tm = g_out["ga"].reshape(n_steps, batch, n_action)
        gan_tm = g_out["gan"].reshape(n_steps, batch, n_action)
        # un-shift the next-action stream's cotangent: next[k] reads
        # actions[k+1] for k < T-1 and actions[T-1] at the clamped end
        g_acts_tm = ga_tm.at[1:].add(gan_tm[:-1]).at[-1].add(gan_tm[-1])
    else:
        g_acts_tm = g_out["ga"].reshape(n_steps, batch, n_action)
    g_actions = g_acts_tm if time_major else jnp.transpose(g_acts_tm, (1, 0, 2))
    g_noise = g_out["gdn"].reshape(n_steps, batch, len(noise_idx)) if has_noise else None
    return (g_y0, g_actions, g_params, g_noise)


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


@functools.partial(
    jax.jit,
    static_argnames=(
        "ode", "solver", "n_steps", "tau", "wrap_flags", "clip_fn", "traj_stride",
        "fast_wrap", "time_major", "sim_ahead", "interpret", "noise_idx",
    ),
)
def fused_rollout(
    ode,
    solver: ExplicitRungeKutta,
    y0: tuple,
    actions,
    n_steps: int,
    tau: float,
    wrap_flags: tuple,
    clip_fn=None,
    traj_stride: int = None,
    fast_wrap: bool = False,
    time_major: bool = False,
    param_leaves: tuple = (),
    sim_ahead: bool = False,
    interpret: bool = False,
    noise_tm=None,
    noise_idx: tuple = (),
):
    """Run ``n_steps`` fixed-``tau`` solver steps fully on-chip (argument
    contract: see :func:`_launch`).  Differentiable: ``jax.grad`` through
    this call triggers the checkpointed-recompute VJP (one kernel launch
    forward, plain-JAX segment pull-backs backward) with gradients w.r.t.
    ``y0``, ``actions``, ``param_leaves`` and ``noise_tm`` matching the scan
    path (noise gradients are the reparameterization-trick pathway)."""
    # validate here, not only in _launch: the VJP forward launches with the
    # checkpoint stride instead of traj_stride, so an invalid stride must
    # fail identically with and without a surrounding grad transform
    if traj_stride is not None and n_steps % traj_stride != 0:
        raise ValueError("n_steps must be divisible by traj_stride")
    return _fused_core(
        ode, solver, n_steps, tau, wrap_flags, clip_fn, traj_stride, fast_wrap,
        time_major, sim_ahead, interpret, tuple(noise_idx), y0, actions,
        tuple(param_leaves), noise_tm,
    )


def sim_ahead_ratio(obs_stepsize: float, action_stepsize: float):
    """``action_stepsize / obs_stepsize`` as an exact small integer, else None.

    ``vmap_sim_ahead`` itself requires the ratio to be integral (reference
    ``core_env.py:447-448``); non-integral ratios are out of every path's
    scope and float jitter far below 1e-9-relative never occurs for the
    physically meaningful stepsizes."""
    r = action_stepsize / obs_stepsize
    R = int(round(r))
    if R >= 1 and abs(r - R) <= 1e-9 * R:
        return R
    return None


def supports_fused_sim_ahead(env, obs_stepsize: float, action_stepsize: float) -> bool:
    """Whether the fused trajectory kernel covers this ``vmap_sim_ahead``
    configuration: env in kernel scope and an integral stepsize ratio (the
    solver steps on the obs grid; each action is streamed for
    ``action_stepsize / obs_stepsize`` consecutive steps)."""
    return (
        supports_fused_rollout(env)
        # sim-ahead is the deterministic trajectory solve (vmap_sim_ahead
        # itself raises on stochastic envs)
        and not getattr(env, "_has_noise", False)
        and sim_ahead_ratio(obs_stepsize, action_stepsize) is not None
    )


def supports_fused_rollout(env) -> bool:
    """Whether ``env`` is inside the fused kernel's scope.

    Scalar parameters are closed over; ``(batch,)``-shaped heterogeneous
    parameter/normalization leaves are streamed as per-tile operands.
    """
    param_leaves = jax.tree_util.tree_leaves(env.env_properties.static_params) + jax.tree_util.tree_leaves(
        env.env_properties.action_normalizations
    )
    return (
        all(
            np.isscalar(leaf) or np.shape(leaf) == (env.batch_size,)
            for leaf in param_leaves
        )
        and len(env._ode_state_fields) == env.physical_state_dim
        and env.batch_size % TILE == 0
        and isinstance(env._solver, ExplicitRungeKutta)
        # stochastic envs ARE in step-mode scope: env_fused_rollout precomputes
        # the scan path's exact per-step noise draws in an XLA pre-pass and
        # streams the increments into the kernel alongside the actions
    )


def _batched_param_closure(env):
    """Split ``static_params`` into scalar and per-batch leaves and build a
    tile ODE ``ode(t, y, action, param_tiles)`` reconstructing the params
    pytree with the streamed tiles in place of the batched leaves.

    The batched leaf VALUES enter the kernel as operands (``param_leaves``),
    so the cached closure stays valid when a per-shard property override
    supplies different values at the same positions (see
    :func:`_override_param_leaves`)."""
    params = env.env_properties.static_params
    leaves, treedef = jax.tree_util.tree_flatten(params)
    batched_idx = tuple(i for i, leaf in enumerate(leaves) if not np.isscalar(leaf))
    batched_leaves = tuple(jnp.asarray(leaves[i]) for i in batched_idx)

    def tile_ode(t, y, action, param_tiles):
        new_leaves = list(leaves)
        for i, tile in zip(batched_idx, param_tiles):
            new_leaves[i] = tile
        p = jax.tree_util.tree_unflatten(treedef, new_leaves)
        return env._ode(t, y, p, lambda _t: action)

    return tile_ode, batched_leaves


def _override_param_leaves(env, props):
    """Batched static-param leaf values from a per-shard property override,
    at the same flat positions :func:`_batched_param_closure` streams — the
    cached tile ODE reads positions, the operands carry the values."""
    leaves = jax.tree_util.tree_leaves(props.static_params)
    return tuple(
        jnp.asarray(leaf) for leaf in leaves if not np.isscalar(leaf)
    )


def _denormalize_action_slab(env, actions_norm, time_major, props=None):
    """Denormalize a whole (B, T, A) / (T, B, A) action slab, vmapping the
    per-batch axis over heterogeneous action normalizations.  ``props``
    overrides ``env.env_properties`` (per-shard slices)."""
    props = env.env_properties if props is None else props
    in_ax = env.in_axes_env_properties
    denorm_b = jax.vmap(env.denormalize_action, in_axes=(0, in_ax))
    if time_major:
        return jax.vmap(denorm_b, in_axes=(0, None))(actions_norm, props)
    denorm_bt = jax.vmap(
        lambda a, p: jax.vmap(env.denormalize_action, in_axes=(0, None))(a, p),
        in_axes=(0, in_ax),
    )
    return denorm_bt(actions_norm, props)


def _apply_obs_noise_slab(env, obs, eps, props=None):
    """Batched mirror of ``CoreEnvironment._apply_observation_noise_eps``:
    scale the precomputed standard-normal draws ``eps`` (``(B[, S],
    len(layout))``) by the per-entry normalized sigma (the same
    ``CoreEnvironment._obs_noise_sigma_norm`` arithmetic, per-batch spans
    included) and add onto the ``_obs_noise_layout`` columns of ``obs``.
    ``props`` overrides ``env.env_properties`` (the mesh layer's per-shard
    property slices)."""
    sigmas = [
        jnp.broadcast_to(jnp.asarray(v), (env.batch_size,))
        for v in env._obs_noise_sigma_norm(props or env.env_properties)
    ]
    for k, (col, _name) in enumerate(env._obs_noise_layout):
        s = sigmas[k] if eps.ndim == 2 else sigmas[k][:, None]
        obs = obs.at[..., col].add(s * eps[..., k])
    return obs


def _final_solver_state(env, y_final, last_action_phys, props=None):
    """Reconstruct the scan path's final solver carry.

    Step mode stores ``f(t1, y1)`` under the final action for FSAL methods
    (``solvers.ExplicitRungeKutta.step``) and ``None`` otherwise.
    """
    if not env._solver.fsal:
        return None
    params = (props or env.env_properties).static_params
    in_ax_p = jax.tree_util.tree_map(
        lambda leaf: 0 if not np.isscalar(leaf) else None, params
    )

    def k_end(y, action, p):
        f = env._vector_field(lambda t: action)
        return f(env.tau, y, p)

    return jax.vmap(k_end, in_axes=(0, 0, in_ax_p))(
        y_final, last_action_phys, params
    )


def env_fused_rollout(
    env,
    init_state,
    actions_norm,
    obs_stride: int = None,
    time_major: bool = False,
    interpret: bool = False,
    strict: bool = False,
    return_traj_states: bool = False,
    env_properties=None,
):
    """Environment-level fused rollout: normalized actions in, ``(obs, state)``
    out — numerically identical to the scan path for in-scope envs on TPU
    hardware (the XLA CPU backend's context-dependent FMA contraction limits
    cross-program agreement to ~1 ulp/step there); transparently falls back
    to the XLA scan path otherwise.

    With ``obs_stride`` set, every ``obs_stride``-th observation is returned,
    shape ``(B, n_steps // obs_stride, obs_dim)``; otherwise only the final
    observation ``(B, obs_dim)``.

    ``time_major=True`` takes actions ``(n_steps, B, A)`` — the layout the
    kernel streams, saving a full transposed copy of the slab per call (for
    peak sustained throughput also jit-wrap the call so the pre-passes fuse
    into one executable).  The fallback scan path transposes back.
    """
    n_steps = actions_norm.shape[0] if time_major else actions_norm.shape[1]
    if return_traj_states and obs_stride is None:
        raise ValueError("return_traj_states requires obs_stride")
    # an explicit env_properties override is the mesh layer's per-shard hook:
    # scope was checked against the full-batch env, and the override's traced
    # leaves cannot be shape-inspected here
    props = env.env_properties if env_properties is None else env_properties
    if env_properties is None and not supports_fused_rollout(env):
        if strict or return_traj_states:
            raise ValueError(
                "env_fused_rollout out of kernel scope (per-batch param shapes, "
                "state layout, batch tiling, or solver family); strict=True "
                "forbids the scan fallback"
            )
        if time_major:
            actions_norm = jnp.transpose(actions_norm, (1, 0, 2))
        obs, last_state = env.vmap_rollout(init_state, actions_norm, obs_stride or n_steps)
        if obs_stride is None:
            obs = obs[:, -1]
        return obs, last_state

    # denormalize once — a cheap XLA pre-pass over the action slab; the
    # optional state-independent action constraint applies on the same slab
    # (actuator realism at the exact point the scan paths apply it)
    actions = _denormalize_action_slab(env, actions_norm, time_major, props=props)
    actions = env._constrained_phys_action(actions)

    # stochastic envs: precompute the scan path's per-step noise draws (the
    # shared CoreEnvironment._noise_slabs stream — the exact split(key, 3)
    # chain, or the time-parallel counter-style stream for
    # noise_mode="fast") in an XLA pre-pass, pre-scale the process
    # increments, and stream them into the kernel alongside the actions —
    # the kernel stays deterministic, the semantics stay the scan's
    noise_tm, noise_idx, eps_obs, final_keys, keys_saves = None, (), None, None, None
    if getattr(env, "_has_noise", False):
        keys0 = env._require_noise_key(init_state)
        stride = obs_stride or n_steps
        eps_proc, eps_obs, keys_saves, final_keys = env._noise_slabs(
            keys0, n_steps, stride
        )
        if eps_proc is not None:
            proc_items = sorted(env._process_noise.items())
            coef = jnp.asarray([s for _, s in proc_items], dtype=eps_proc.dtype) * jnp.sqrt(
                env.tau
            )
            noise_tm = jnp.transpose(coef * eps_proc, (1, 0, 2))  # (T, B, n_noise)
            noise_idx = tuple(env._ode_state_fields.index(n) for n, _ in proc_items)

    # the tile ODE is cached on the env so the jitted kernel is reused across
    # calls (a fresh closure per call would miss the jit cache every time)
    cached = env.__dict__.get("_fused_tile_ode")
    if cached is None:
        cached = _batched_param_closure(env)
        env.__dict__["_fused_tile_ode"] = cached
    tile_ode, param_leaves = cached
    if env_properties is not None:
        # same flat positions, the override's (per-shard) values
        param_leaves = _override_param_leaves(env, props)

    y0 = tuple(jnp.asarray(getattr(init_state.physical_state, n)) for n in env._ode_state_fields)
    wrap_flags = tuple(n in env._angle_fields for n in env._ode_state_fields)
    clip_fn_raw = env._clip_state if type(env)._clip_state is not CoreEnvironment._clip_state else None

    result = fused_rollout(
        tile_ode,
        env._solver,
        y0,
        actions,
        n_steps,
        env.tau,
        wrap_flags,
        clip_fn=clip_fn_raw,
        traj_stride=obs_stride,
        fast_wrap=getattr(env, "fast_math", False),
        time_major=time_major,
        param_leaves=param_leaves,
        interpret=interpret,
        noise_tm=noise_tm,
        noise_idx=noise_idx,
    )
    y_final, y_traj = result if obs_stride is not None else (result, None)

    from exciting_environments_tpu.core import structures

    last_action = actions[-1] if time_major else actions[:, -1]
    key_kwargs = {} if final_keys is None else {"PRNGKey": final_keys}
    final_state = structures.replace(
        init_state,
        physical_state=env.PhysicalState(**dict(zip(env._ode_state_fields, y_final))),
        additions=env.Additions(
            solver_state=_final_solver_state(env, y_final, last_action, props=props),
            active_solver_state=jnp.full(env.batch_size, True),
        ),
        **key_kwargs,
    )
    if obs_stride is None:
        obs = jax.vmap(env.generate_observation, in_axes=(0, env.in_axes_env_properties))(
            final_state, props
        )
        if eps_obs is not None:
            obs = _apply_obs_noise_slab(env, obs, eps_obs[:, -1], props=props)
        return obs, final_state

    # trajectory observations: vmap over (batch, time) on reconstructed states
    n_saves = n_steps // obs_stride
    traj_state = structures.replace(
        final_state,
        physical_state=env.PhysicalState(**dict(zip(env._ode_state_fields, y_traj))),
        # stochastic envs: each save carries ITS step's advanced key (scan
        # parity — resuming from a saved state must not replay consumed
        # draws); deterministic envs keep the unchanged initial key
        PRNGKey=(
            keys_saves
            if keys_saves is not None
            else (
                lambda key: jnp.broadcast_to(
                    key[:, None, ...], (env.batch_size, n_saves) + key.shape[1:]
                )
            )(jnp.asarray(init_state.PRNGKey))
        ),
        additions=env.Additions(
            solver_state=None,
            active_solver_state=jnp.full((env.batch_size, n_saves), True),
        ),
        reference=jax.tree_util.tree_map(
            lambda leaf: jnp.broadcast_to(jnp.asarray(leaf)[:, None], (env.batch_size, n_saves)),
            init_state.reference,
        ),
    )
    obs = jax.vmap(
        jax.vmap(env.generate_observation, in_axes=(0, None)),
        in_axes=(0, env.in_axes_env_properties),
    )(traj_state, props)
    if eps_obs is not None:
        # eps_obs is already saves-only: the saved steps' own sensor draws
        # (post-step save at step t uses that step's k_obs), exactly like
        # the scan path's per-step obs
        obs = _apply_obs_noise_slab(env, obs, eps_obs, props=props)
    if return_traj_states:
        # the reconstructed per-save State pytree (leaves (B, n_saves, ...)) —
        # consumed by the fused trajectory collector for reward/flag
        # evaluation in the same jitted program
        return obs, traj_state, final_state
    return obs, final_state


def env_fused_sim_ahead(
    env,
    init_state,
    actions_norm,
    obs_stepsize: float,
    action_stepsize: float,
    obs_stride: int = 1,
    time_major: bool = False,
    interpret: bool = False,
    strict: bool = False,
    env_properties=None,
):
    """Fused trajectory solve matching :meth:`CoreEnvironment.vmap_sim_ahead`
    semantics: the solver steps on the observation grid (``tau =
    obs_stepsize``), each action is held for ``action_stepsize /
    obs_stepsize`` consecutive steps (ZOH), the integration carry is never
    wrapped/clipped, and ``c == 1.0`` stages read the ZOH action of the NEXT
    solver interval (reference ``core_env.py:435-448``).  Out-of-scope
    configurations fall back to ``vmap_sim_ahead`` (``strict=True`` raises
    instead).

    Returns ``(observations, last_state)`` with observations of shape
    ``(B, 1 + total_steps // obs_stride, obs_dim)`` where ``total_steps =
    n_actions * (action_stepsize / obs_stepsize)`` (initial observation
    included, like the reference's ``SaveAt`` grid).  The full time-major
    ``states`` pytree of ``vmap_sim_ahead`` is intentionally not
    materialized — it is the memory-dominant output; use the scan path when
    it is needed.
    """
    n_actions = actions_norm.shape[0] if time_major else actions_norm.shape[1]
    ratio = sim_ahead_ratio(obs_stepsize, action_stepsize)
    props = env.env_properties if env_properties is None else env_properties
    if env_properties is None and not supports_fused_sim_ahead(env, obs_stepsize, action_stepsize):
        if strict:
            raise ValueError(
                "env_fused_sim_ahead out of kernel scope (env support or "
                "non-integral stepsize ratio); strict=True forbids the scan fallback"
            )
        if time_major:
            actions_norm = jnp.transpose(actions_norm, (1, 0, 2))
        obs, states, last_state = env.vmap_sim_ahead(
            init_state, actions_norm, obs_stepsize, action_stepsize
        )
        return obs[:, ::obs_stride], last_state

    from exciting_environments_tpu.core import structures
    from exciting_environments_tpu.core.env import CoreEnvironment as _Core

    actions = _denormalize_action_slab(env, actions_norm, time_major, props=props)
    actions = env._constrained_phys_action(actions)
    # ZOH onto the solver (= observation) grid: each action drives `ratio`
    # consecutive solver steps.  The repeat is an XLA pre-pass on the
    # (denormalized) slab; the kernel's one-slot-shifted copy of the expanded
    # stream then realizes exactly the guarded floor-division index of
    # ops.rollout.zoh_action at every stage (interior stages never sit on an
    # action boundary, c == 1.0 stages read (k + 1) // ratio).
    n_steps = n_actions * ratio
    if ratio > 1:
        actions = jnp.repeat(actions, ratio, axis=0 if time_major else 1)

    cached = env.__dict__.get("_fused_tile_ode")
    if cached is None:
        cached = _batched_param_closure(env)
        env.__dict__["_fused_tile_ode"] = cached
    tile_ode, param_leaves = cached
    if env_properties is not None:
        param_leaves = _override_param_leaves(env, props)

    y0 = tuple(jnp.asarray(getattr(init_state.physical_state, n)) for n in env._ode_state_fields)
    wrap_flags = tuple(n in env._angle_fields for n in env._ode_state_fields)
    clip_fn_raw = env._clip_state if type(env)._clip_state is not _Core._clip_state else None

    y_final_raw, y_traj_raw = fused_rollout(
        tile_ode,
        env._solver,
        y0,
        actions,
        n_steps,
        float(obs_stepsize),
        wrap_flags,
        clip_fn=None,  # sim-ahead never clips the carry; saves post-processed below
        traj_stride=obs_stride,
        fast_wrap=getattr(env, "fast_math", False),
        time_major=time_major,
        param_leaves=param_leaves,
        sim_ahead=True,
        interpret=interpret,
    )

    def postprocess(y_tuple):
        # the reference wraps/clips the SAVED trajectory only
        # (_ode_solver_simulate_ahead); replicate on the saved values
        y_tuple = tuple(
            ((leaf + jnp.pi) % (2 * jnp.pi)) - jnp.pi if wrap else leaf
            for leaf, wrap in zip(y_tuple, wrap_flags)
        )
        if clip_fn_raw is not None:
            y_tuple = clip_fn_raw(y_tuple)
        return y_tuple

    y_final = postprocess(y_final_raw)
    y_traj = postprocess(y_traj_raw)

    n_saves = n_steps // obs_stride
    batch = env.batch_size

    last_action = actions[-1] if time_major else actions[:, -1]
    last_state = structures.replace(
        init_state,
        physical_state=env.PhysicalState(**dict(zip(env._ode_state_fields, y_final))),
        additions=env.Additions(
            # FSAL carry from the RAW (unwrapped/unclipped) integration state
            # — the quantity the scan path's solver actually carries; the
            # stored value is informational-only today (step() re-initializes
            # the carry via active_solver_state=True) but should match anyway
            solver_state=_final_solver_state(env, y_final_raw, last_action, props=props),
            active_solver_state=jnp.full(batch, True),
        ),
        # sim_ahead rebuilds a NaN reference (reference pendulum_env.py:243-258)
        reference=jax.tree_util.tree_map(
            lambda leaf: jnp.full(batch, jnp.nan), init_state.reference
        ),
    )

    # trajectory observations incl. the initial state's observation
    obs0 = jax.vmap(env.generate_observation, in_axes=(0, env.in_axes_env_properties))(
        init_state, props
    )
    traj_state = structures.replace(
        last_state,
        physical_state=env.PhysicalState(**dict(zip(env._ode_state_fields, y_traj))),
        PRNGKey=(
            lambda key: jnp.broadcast_to(key[:, None, ...], (batch, n_saves) + key.shape[1:])
        )(jnp.asarray(init_state.PRNGKey)),
        additions=env.Additions(
            solver_state=None,
            active_solver_state=jnp.full((batch, n_saves), True),
        ),
        reference=jax.tree_util.tree_map(
            lambda leaf: jnp.full((batch, n_saves), jnp.nan), init_state.reference
        ),
    )
    obs_traj = jax.vmap(
        jax.vmap(env.generate_observation, in_axes=(0, None)),
        in_axes=(0, env.in_axes_env_properties),
    )(traj_state, props)
    observations = jnp.concatenate([obs0[:, None, :], obs_traj], axis=1)
    return observations, last_state


# ---------------------------------------------------------------------------
# Closed-loop policy-in-kernel rollout
#
# The open-loop kernels stream a precomputed action slab from HBM; a closed
# loop (policy pi(obs) -> action every step) normally forces the scan path —
# one XLA dispatch granularity per policy evaluation.  Here the policy runs
# INSIDE the kernel on (rows, 128) tiles: observations are the normalized
# state leaves (the exact MinMaxNormalization arithmetic of
# generate_observation) plus the normalized tracked-reference components, the
# policy's normalized action is denormalized with the exact
# denormalize_action expression, and the step proceeds like step mode.  No
# action traffic at all — the whole control loop is VMEM-resident.
# Reference semantics bar: the GymWrapper closed loop
# (reference gym_wrapper.py:88-130), one observation -> action -> step per
# control period.  STOCHASTIC ENVS stay in scope: sensor/process draw slabs
# are precomputed in an XLA pre-pass (CoreEnvironment._noise_slabs) and
# streamed like the open-loop kernel's — the policy closes the loop over the
# noisy measurements.  Deterministic POLICIES only (tile-level randomness is
# not plumbed); use RolloutCollector.collect_policy for stochastic policies.
# ---------------------------------------------------------------------------


def _make_closed_loop_kernel(
    ode, solver, policy, chunk, n_state, n_action, n_params, n_refs, tau,
    wrap_flags, clip_fn, obs_norms, act_norms, traj_stride, fast_wrap,
    pp_treedef, n_pp, n_carry, obs_cols=(), noise_idx=(), act_constrain=None,
):
    """Kernel body over refs ``([pparams,] [obs_noise,] [proc_noise,]
    *params, *refs, *state_in, *carry_in, *state_out, *carry_out[,
    *traj_state, *traj_action, *traj_carry])``; grid
    ``(batch_tiles, time_chunks)`` with the state carried in revisited
    output blocks (see :func:`_make_kernel`).
    ``pparams`` is the flattened policy-parameter vector in SMEM (``n_pp``
    scalars, re-assembled into the user's pytree per ``pp_treedef``); with
    ``n_pp == 0`` the policy is parameter-free.  With ``n_carry > 0`` the
    policy is STATEFUL: its per-instance carry leaves ride VMEM planes
    exactly like the integration state and the call contract becomes
    ``policy(obs, step, carry[, params]) -> (action, carry)``.

    Stochastic envs stream pre-scaled draw slabs like the open-loop kernel
    (:func:`_make_kernel`): with ``obs_cols`` set, a sensor-noise slab row is
    added to the indexed observation columns BEFORE the policy each step
    (the caller pre-shifts the slab so row ``i`` carries the draw the scan
    path's policy would see at step ``i`` — step ``i-1``'s post-step sensor
    draw, zeros at ``i == 0``); with ``noise_idx`` set, a process-noise slab
    row is added to the indexed state leaves after the deterministic
    wrap/clip, followed by a second wrap/clip — the exact operation order of
    ``CoreEnvironment._apply_process_noise``."""

    def kernel(*refs):
        if n_pp:
            pp_ref = refs[0]
            refs = refs[1:]
            if n_pp > _PP_SCALAR_TREE:
                # Mosaic-safe scalar tree: no long-vector assembly in-kernel
                pparams = pp_treedef(tuple(pp_ref[0, i] for i in range(n_pp)))
            else:
                pp_vec = jnp.stack([pp_ref[0, i] for i in range(n_pp)])
                pparams = pp_treedef(pp_vec)  # pp_treedef: the cached unravel fn
        if obs_cols:
            obs_noise_ref = refs[0]
            refs = refs[1:]
        if noise_idx:
            proc_noise_ref = refs[0]
            refs = refs[1:]
        param_refs = refs[:n_params]
        refs = refs[n_params:]
        ref_refs = refs[:n_refs]
        refs = refs[n_refs:]
        in_refs = refs[: n_state + n_carry]
        state_refs = refs[n_state + n_carry : 2 * (n_state + n_carry)]
        traj_refs = refs[2 * (n_state + n_carry) :]
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            for ref, src in zip(state_refs, in_refs):
                ref[:] = src[:]

        params = tuple(ref[:] for ref in param_refs)
        ref_tiles = tuple(ref[:] for ref in ref_refs)

        wrap_op = wrap_angle_fast if fast_wrap else (
            lambda leaf: ((leaf + jnp.pi) % (2 * jnp.pi)) - jnp.pi
        )

        def body(i, yc):
            y, c = yc[:n_state], yc[n_state:]
            step = k * chunk + i
            # observation: the exact MinMaxNormalization arithmetic of
            # generate_observation, leaf by leaf, plus the normalized
            # reference components
            obs = tuple(
                2 * (leaf - mn) / (mx - mn) - 1
                for leaf, (mn, mx) in zip(y, obs_norms)
            ) + ref_tiles
            if obs_cols:
                obs = list(obs)
                for j, col in enumerate(obs_cols):
                    obs[col] = obs[col] + obs_noise_ref[i, j]
                obs = tuple(obs)
            if n_carry:
                out = policy(obs, step, c, pparams) if n_pp else policy(obs, step, c)
                a_norm, c1 = out[0], tuple(out[1])
            else:
                a_norm = policy(obs, step, pparams) if n_pp else policy(obs, step)
                c1 = ()
            # denormalize_action, per component; the optional state-
            # independent action constraint (actuator realism) applies at
            # the same point the scan paths apply it
            phys_a = tuple(
                (a + 1) / 2 * (mx - mn) + mn
                for a, (mn, mx) in zip(a_norm, act_norms)
            )
            if act_constrain is not None:
                phys_a = act_constrain(phys_a)
            action = _IndexableAction(phys_a)
            y1 = _rk_step(
                lambda t, yy, act: ode(t, yy, act, params),
                solver, y, action, tau, step * tau,
            )
            y1 = tuple(
                wrap_op(leaf) if wrap else leaf for leaf, wrap in zip(y1, wrap_flags)
            )
            if clip_fn is not None:
                y1 = clip_fn(y1)
            if noise_idx:
                y1 = list(y1)
                for j, idx in enumerate(noise_idx):
                    y1[idx] = y1[idx] + proc_noise_ref[i, j]
                y1 = tuple(
                    wrap_op(leaf) if wrap else leaf for leaf, wrap in zip(y1, wrap_flags)
                )
                if clip_fn is not None:
                    y1 = clip_fn(y1)
            if traj_stride is not None:

                @pl.when((i + 1) % traj_stride == 0)
                def _():
                    slot = (i + 1) // traj_stride - 1
                    for ref, leaf in zip(traj_refs[:n_state], y1):
                        ref[slot] = leaf
                    for ref, leaf in zip(traj_refs[n_state : n_state + n_action], a_norm):
                        ref[slot] = leaf
                    for ref, leaf in zip(traj_refs[n_state + n_action :], c1):
                        ref[slot] = leaf

            return y1 + c1

        yc = tuple(ref[:] for ref in state_refs)
        yc = jax.lax.fori_loop(0, chunk, body, yc)
        for ref, leaf in zip(state_refs, yc):
            ref[:] = leaf

    return kernel


def _cl_launch(
    ode, solver, policy, n_steps, tau, wrap_flags, obs_norms, act_norms,
    n_action, clip_fn, traj_stride, fast_wrap, interpret, pp_treedef,
    y0, param_leaves, ref_leaves, pp_flat, carry0=None,
    obs_noise_tm=None, proc_noise_tm=None, obs_cols=(), noise_idx=(),
    act_constrain=None,
):
    """Tile the operands and launch the closed-loop kernel (primal of
    :func:`fused_closed_loop`).  With ``carry0`` (tuple of ``(B,)`` float
    leaves) the policy is stateful; returns gain a ``final_carry`` element
    and, with ``traj_stride``, a carry trajectory: ``(final, final_carry)``
    or ``(final, final_carry, traj_state, traj_act, traj_carry)``.

    ``obs_noise_tm`` (``(n_steps, B, len(obs_cols))``, pre-scaled and
    pre-shifted — see :func:`_make_closed_loop_kernel`) and
    ``proc_noise_tm`` (``(n_steps, B, len(noise_idx))``, pre-scaled
    Euler–Maruyama increments) stream time-major alongside the loop like
    the open-loop kernel's noise slab."""
    batch = y0[0].shape[0]
    if batch % TILE != 0:
        raise ValueError(f"batch {batch} must be a multiple of {TILE}")
    if traj_stride is not None and n_steps % traj_stride != 0:
        raise ValueError("n_steps must be divisible by traj_stride")
    if (obs_noise_tm is not None) != bool(obs_cols):
        raise ValueError("obs_noise_tm and obs_cols must be set together")
    if (proc_noise_tm is not None) != bool(noise_idx):
        raise ValueError("proc_noise_tm and noise_idx must be set together")
    n_state = len(y0)
    n_carry = 0 if carry0 is None else len(carry0)
    n_params = len(param_leaves)
    n_refs = len(ref_leaves)
    n_pp = 0 if pp_flat is None else pp_flat.shape[0]
    total_rows = batch // LANES

    rows = SUBLANES
    while rows * 2 <= total_rows and total_rows % (rows * 2) == 0 and rows < 64:
        rows *= 2
    n_batch_tiles = total_rows // rows

    itemsize = jnp.asarray(y0[0]).dtype.itemsize
    streamed_width = len(obs_cols) + len(noise_idx)
    if streamed_width == 0:
        # time chunk: bounds the TOTAL trajectory block set; no streamed
        # operand exists, so without trajectory output one chunk spans the
        # whole horizon
        chunk = _traj_chunk(
            n_steps, traj_stride, rows, itemsize,
            (n_state + n_action + n_carry) if traj_stride is not None else 1,
        )
    else:
        chunk = _streamed_cl_chunk(
            n_steps, traj_stride, rows, itemsize, streamed_width,
            (n_state + n_action + n_carry) if traj_stride is not None else 0,
        )
    n_time_chunks = n_steps // chunk

    y0_tiled = tuple(jnp.asarray(leaf).reshape(total_rows, LANES) for leaf in y0)
    dtype = y0_tiled[0].dtype
    carry_tiled = tuple(
        jnp.asarray(leaf, dtype).reshape(total_rows, LANES) for leaf in (carry0 or ())
    )

    def state_block():
        return pl.BlockSpec((rows, LANES), lambda b, k: (b, 0), memory_space=pltpu.VMEM)

    def _noise_tiled(noise_tm, n_noise):
        if n_noise == 1:
            return noise_tm.reshape(n_steps, 1, total_rows, LANES)
        return jnp.transpose(noise_tm, (0, 2, 1)).reshape(
            n_steps, n_noise, total_rows, LANES
        )

    def _noise_spec(n_noise):
        return pl.BlockSpec(
            (chunk, n_noise, rows, LANES), lambda b, k: (k, 0, b, 0),
            memory_space=pltpu.VMEM,
        )

    in_specs = []
    operands = []
    if n_pp:
        in_specs.append(pl.BlockSpec((1, n_pp), lambda b, k: (0, 0), memory_space=pltpu.SMEM))
        operands.append(jnp.asarray(pp_flat, dtype)[None, :])
    if obs_cols:
        in_specs.append(_noise_spec(len(obs_cols)))
        operands.append(_noise_tiled(obs_noise_tm, len(obs_cols)))
    if noise_idx:
        in_specs.append(_noise_spec(len(noise_idx)))
        operands.append(_noise_tiled(proc_noise_tm, len(noise_idx)))
    for leaf in param_leaves:
        in_specs.append(state_block())
        operands.append(jnp.asarray(leaf).reshape(total_rows, LANES))
    for leaf in ref_leaves:
        in_specs.append(state_block())
        operands.append(jnp.asarray(leaf).reshape(total_rows, LANES))
    in_specs += [state_block() for _ in range(n_state + n_carry)]
    operands += list(y0_tiled) + list(carry_tiled)

    out_specs = [state_block() for _ in range(n_state + n_carry)]
    out_shape = [
        jax.ShapeDtypeStruct((total_rows, LANES), dtype)
        for _ in range(n_state + n_carry)
    ]
    if traj_stride is not None:
        n_saves = n_steps // traj_stride
        saves_per_chunk = chunk // traj_stride
        traj_index = lambda b, k: (k, b, 0)
        out_specs += [
            pl.BlockSpec((saves_per_chunk, rows, LANES), traj_index, memory_space=pltpu.VMEM)
            for _ in range(n_state + n_action + n_carry)
        ]
        out_shape += [
            jax.ShapeDtypeStruct((n_saves, total_rows, LANES), dtype)
            for _ in range(n_state + n_action + n_carry)
        ]

    kernel = _make_closed_loop_kernel(
        ode, solver, policy, chunk, n_state, n_action, n_params, n_refs, tau,
        wrap_flags, clip_fn, obs_norms, act_norms, traj_stride, fast_wrap,
        pp_treedef, n_pp, n_carry, obs_cols=obs_cols, noise_idx=noise_idx,
        act_constrain=act_constrain,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_batch_tiles, n_time_chunks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)

    final = tuple(o.reshape(batch) for o in out[:n_state])
    final_carry = tuple(o.reshape(batch) for o in out[n_state : n_state + n_carry])
    if traj_stride is None:
        return (final, final_carry) if n_carry else final
    n_saves = n_steps // traj_stride
    rest = out[n_state + n_carry :]

    def _t(o):
        return jnp.moveaxis(o.reshape(n_saves, batch), 0, 1)

    traj_state = tuple(_t(o) for o in rest[:n_state])
    traj_act = tuple(_t(o) for o in rest[n_state : n_state + n_action])
    traj_carry = tuple(_t(o) for o in rest[n_state + n_action :])
    if n_carry:
        return final, final_carry, traj_state, traj_act, traj_carry
    return final, traj_state, traj_act


def _plain_cl_step(
    ode, solver, policy, tau, wrap_flags, clip_fn, obs_norms, act_norms,
    fast_wrap, has_pp, params, has_carry=False, obs_cols=(), noise_idx=(),
    act_constrain=None,
):
    """The closed-loop kernel's per-step computation in plain
    (differentiable) JAX over ``(B,)`` leaves: normalize -> [+sensor noise]
    -> policy -> denormalize -> RK step -> wrap/clip [-> +process noise ->
    wrap/clip].  Returns ``(y1, c1, a_norm)`` (``c1 = ()`` for stateless
    policies).  With ``obs_cols``/``noise_idx`` the step takes two extra
    args — the step's pre-scaled sensor/process noise rows ``(B, n)`` —
    mirroring the kernel's slab application exactly."""

    def step(y, c, t_step, refs, pparams, eo=None, ep=None):
        obs = tuple(
            2 * (leaf - mn) / (mx - mn) - 1
            for leaf, (mn, mx) in zip(y, obs_norms)
        ) + refs
        if obs_cols:
            obs = list(obs)
            for j, col in enumerate(obs_cols):
                obs[col] = obs[col] + eo[..., j]
            obs = tuple(obs)
        if has_carry:
            out = policy(obs, t_step, c, pparams) if has_pp else policy(obs, t_step, c)
            a_norm, c1 = out[0], tuple(out[1])
        else:
            a_norm = policy(obs, t_step, pparams) if has_pp else policy(obs, t_step)
            c1 = ()
        phys_a = tuple(
            (a + 1) / 2 * (mx - mn) + mn
            for a, (mn, mx) in zip(a_norm, act_norms)
        )
        if act_constrain is not None:
            phys_a = act_constrain(phys_a)
        action = _IndexableAction(phys_a)
        y1 = _rk_step(
            lambda tt, yy, act: ode(tt, yy, act, params),
            solver, y, action, tau, t_step * tau,
        )
        wrap_op = wrap_angle_fast if fast_wrap else (
            lambda leaf: ((leaf + jnp.pi) % (2 * jnp.pi)) - jnp.pi
        )
        y1 = tuple(
            wrap_op(leaf) if wrap else leaf for leaf, wrap in zip(y1, wrap_flags)
        )
        if clip_fn is not None:
            y1 = clip_fn(y1)
        if noise_idx:
            y1 = list(y1)
            for j, idx in enumerate(noise_idx):
                y1[idx] = y1[idx] + ep[..., j]
            y1 = tuple(
                wrap_op(leaf) if wrap else leaf for leaf, wrap in zip(y1, wrap_flags)
            )
            if clip_fn is not None:
                y1 = clip_fn(y1)
        return y1, c1, a_norm

    return step


_UNRAVEL_CACHE = {}


#: above this flat parameter count the kernels rebuild the policy-parameter
#: pytree from the SMEM scalars as NESTED TUPLES instead of stacking one
#: flat vector: Mosaic cannot assemble long vectors from scalars ("input
#: offsets outside of the first tile" at ~256 elements), and scalar-tree
#: leaves index identically (``w[i][j]``/``b[j]`` work on tuples and jnp
#: arrays alike — the contract tile policies with array-shaped parameter
#: leaves must follow, see utils/rl_fused._tile_mlp)
_PP_SCALAR_TREE = 64


def _nest_scalars(chunk, shp):
    """Rebuild one raveled leaf from scalars as nested tuples (C order)."""
    if shp == ():
        return chunk[0]
    if len(shp) == 1:
        return tuple(chunk)
    sub = 1
    for d in shp[1:]:
        sub *= d
    return tuple(
        _nest_scalars(chunk[i * sub : (i + 1) * sub], shp[1:]) for i in range(shp[0])
    )


def _cached_unravel(params):
    """``ravel_pytree`` with a structure-keyed cache for the unravel
    callable, so it stays a STABLE static argument across calls (a fresh
    unravel per call would miss the jit cache every time).

    The cached callable accepts EITHER a flat array (the standard
    ``ravel_pytree`` inverse — scan/VJP paths) OR a tuple of scalars (the
    kernels' Mosaic-safe scalar-tree path for ``n_pp > _PP_SCALAR_TREE``:
    array-shaped leaves come back as nested tuples of 0-d scalars)."""
    from jax.flatten_util import ravel_pytree

    flat, unravel = ravel_pytree(params)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    shapes = tuple(jnp.shape(l) for l in leaves)
    key = (
        treedef,
        tuple((shp, str(jnp.result_type(l))) for shp, l in zip(shapes, leaves)),
    )

    def unravel_any(x, _unravel=unravel, _treedef=treedef, _shapes=shapes):
        if isinstance(x, tuple):
            out, k = [], 0
            for shp in _shapes:
                n = 1
                for d in shp:
                    n *= d
                out.append(_nest_scalars(x[k : k + n], shp))
                k += n
            return jax.tree_util.tree_unflatten(_treedef, out)
        return _unravel(x)

    return flat, _UNRAVEL_CACHE.setdefault(key, unravel_any)


_N_CL_STATIC = 17


@functools.partial(jax.custom_vjp, nondiff_argnums=tuple(range(_N_CL_STATIC)))
def _cl_core(
    ode, solver, policy, n_steps, tau, wrap_flags, obs_norms, act_norms,
    n_action, clip_fn, traj_stride, fast_wrap, interpret, pp_treedef,
    obs_cols, noise_idx, act_constrain,
    y0, param_leaves, ref_leaves, pp_flat, carry0, obs_noise_tm, proc_noise_tm,
):
    return _cl_launch(
        ode, solver, policy, n_steps, tau, wrap_flags, obs_norms, act_norms,
        n_action, clip_fn, traj_stride, fast_wrap, interpret, pp_treedef,
        y0, param_leaves, ref_leaves, pp_flat, carry0,
        obs_noise_tm=obs_noise_tm, proc_noise_tm=proc_noise_tm,
        obs_cols=obs_cols, noise_idx=noise_idx, act_constrain=act_constrain,
    )


def _cl_core_fwd(
    ode, solver, policy, n_steps, tau, wrap_flags, obs_norms, act_norms,
    n_action, clip_fn, traj_stride, fast_wrap, interpret, pp_treedef,
    obs_cols, noise_idx, act_constrain,
    y0, param_leaves, ref_leaves, pp_flat, carry0, obs_noise_tm, proc_noise_tm,
):
    ckpt = _ckpt_stride(n_steps, traj_stride)
    has_carry = carry0 is not None
    res = _cl_launch(
        ode, solver, policy, n_steps, tau, wrap_flags, obs_norms, act_norms,
        n_action, clip_fn, ckpt, fast_wrap, interpret, pp_treedef,
        y0, param_leaves, ref_leaves, pp_flat, carry0,
        obs_noise_tm=obs_noise_tm, proc_noise_tm=proc_noise_tm,
        obs_cols=obs_cols, noise_idx=noise_idx, act_constrain=act_constrain,
    )
    if has_carry:
        final, final_c, saves, act_saves, carry_saves = res
    else:
        final, saves, act_saves = res
        final_c, carry_saves = (), ()
    if traj_stride is None:
        out = (final, final_c) if has_carry else final
    else:
        skip = traj_stride // ckpt
        st = tuple(s[:, skip - 1 :: skip] for s in saves)
        at = tuple(a[:, skip - 1 :: skip] for a in act_saves)
        if has_carry:
            ct = tuple(c[:, skip - 1 :: skip] for c in carry_saves)
            out = (final, final_c, st, at, ct)
        else:
            out = (final, st, at)
    return out, (
        y0, param_leaves, ref_leaves, pp_flat, carry0, obs_noise_tm,
        proc_noise_tm, saves, carry_saves,
    )


def _cl_core_bwd(
    ode, solver, policy, n_steps, tau, wrap_flags, obs_norms, act_norms,
    n_action, clip_fn, traj_stride, fast_wrap, interpret, pp_treedef,
    obs_cols, noise_idx, act_constrain,
    res, g,
):
    (
        y0, param_leaves, ref_leaves, pp_flat, carry0, obs_noise_tm,
        proc_noise_tm, saves, carry_saves,
    ) = res
    batch = y0[0].shape[0]
    ckpt = _ckpt_stride(n_steps, traj_stride)
    n_seg = n_steps // ckpt
    has_pp = pp_flat is not None
    has_carry = carry0 is not None
    n_carry = len(carry0) if has_carry else 0

    if traj_stride is None:
        if has_carry:
            g_final, g_final_c = g
        else:
            g_final, g_final_c = g, ()
        g_traj = g_traj_act = g_traj_c = None
    elif has_carry:
        g_final, g_final_c, g_traj, g_traj_act, g_traj_c = g
    else:
        g_final, g_traj, g_traj_act = g
        g_final_c, g_traj_c = (), None

    def _starts(leaves0, save_leaves):
        return tuple(
            jnp.concatenate(
                [jnp.asarray(l0)[None], jnp.moveaxis(s[:, :-1], 1, 0)], axis=0
            )
            for l0, s in zip(leaves0, save_leaves)
        )

    starts = _starts(y0, saves)
    c_starts = _starts(carry0, carry_saves) if has_carry else ()
    ts_seg = jnp.asarray(
        np.arange(n_steps, dtype=np.int64).reshape(n_seg, ckpt)
    )

    # saved-state/carry cotangents land on the segment-end carry; the saved
    # ACTION of a save step is the policy output at the segment's LAST
    # pre-step state, exposed as a secondary segment output
    def _inject(traj_g, templates):
        if traj_g is None:
            return tuple(
                jnp.zeros((n_seg, batch), dtype=jnp.result_type(t)) for t in templates
            )
        skip = traj_stride // ckpt
        return tuple(
            jnp.zeros((n_seg, batch), dtype=jnp.result_type(t))
            .at[skip - 1 :: skip]
            .set(jnp.moveaxis(leaf, 1, 0))
            for leaf, t in zip(traj_g, templates)
        )

    g_save_seg = _inject(g_traj, tuple(jnp.asarray(l) for l in y0))
    g_act_seg = _inject(
        g_traj_act, tuple(jnp.asarray(y0[0]) for _ in range(n_action))
    )
    g_carry_seg = (
        _inject(g_traj_c, tuple(jnp.asarray(l) for l in carry0)) if has_carry else ()
    )

    # streamed noise slabs reshape into per-segment blocks; the VJP threads
    # them through the recompute (the reparameterization-trick pathway, like
    # the open-loop kernel's noise gradient)
    has_on = obs_noise_tm is not None
    has_pn = proc_noise_tm is not None
    on_seg = (
        obs_noise_tm.reshape(n_seg, ckpt, batch, len(obs_cols))
        if has_on
        else jnp.zeros((n_seg, ckpt, batch, 0), dtype=jnp.result_type(y0[0]))
    )
    pn_seg = (
        proc_noise_tm.reshape(n_seg, ckpt, batch, len(noise_idx))
        if has_pn
        else jnp.zeros((n_seg, ckpt, batch, 0), dtype=jnp.result_type(y0[0]))
    )

    def seg_apply(y_start, c_start, t_s, params, refs, pp, on_s, pn_s):
        ppy = pp_treedef(pp) if has_pp else None
        inner = _plain_cl_step(
            ode, solver, policy, tau, wrap_flags, clip_fn, obs_norms, act_norms,
            fast_wrap, has_pp, params, has_carry=has_carry,
            obs_cols=obs_cols, noise_idx=noise_idx, act_constrain=act_constrain,
        )

        def body(yc, xs):
            y, c = yc
            t_step, eo, ep = xs
            y1, c1, a_norm = inner(y, c, t_step, refs, ppy, eo, ep)
            return (y1, c1), a_norm

        (y_end, c_end), a_all = jax.lax.scan(
            body, (y_start, c_start), (t_s, on_s, pn_s)
        )
        # only the LAST step's action can be a save (ckpt divides traj_stride)
        a_last = tuple(a[-1] for a in a_all)
        return y_end, c_end, a_last

    g_params0 = tuple(jnp.zeros_like(jnp.asarray(p)) for p in param_leaves)
    g_refs0 = tuple(jnp.zeros_like(jnp.asarray(r)) for r in ref_leaves)
    g_pp0 = jnp.zeros_like(pp_flat) if has_pp else None

    def bwd_body(carry, xs):
        g_y, g_c, g_params, g_refs, g_pp = carry
        start_s, c_start_s, t_s, g_save_s, g_act_s, g_carry_s, on_s, pn_s = xs
        g_y = tuple(gy + gs for gy, gs in zip(g_y, g_save_s))
        g_c = tuple(gc + gs for gc, gs in zip(g_c, g_carry_s))
        _, vjp_fn = jax.vjp(
            lambda y, c, p, r, pp, on, pn: seg_apply(y, c, t_s, p, r, pp, on, pn),
            start_s, c_start_s, param_leaves, ref_leaves,
            pp_flat if has_pp else jnp.zeros((0,)), on_s, pn_s,
        )
        gy_in, gc_in, gp, gr, gpp, g_on, g_pn = vjp_fn((g_y, g_c, g_act_s))
        g_params = tuple(a + b for a, b in zip(g_params, gp))
        g_refs = tuple(a + b for a, b in zip(g_refs, gr))
        if has_pp:
            g_pp = g_pp + gpp
        return (gy_in, gc_in, g_params, g_refs, g_pp), (g_on, g_pn)

    (g_y0, g_c0, g_params, g_refs, g_pp), (g_on_all, g_pn_all) = jax.lax.scan(
        bwd_body,
        (g_final, g_final_c, g_params0, g_refs0, g_pp0 if has_pp else jnp.zeros((0,))),
        (starts, c_starts, ts_seg, g_save_seg, g_act_seg, g_carry_seg, on_seg, pn_seg),
        reverse=True,
    )
    return (
        g_y0, g_params, g_refs,
        g_pp if has_pp else None,
        g_c0 if has_carry else None,
        g_on_all.reshape(n_steps, batch, len(obs_cols)) if has_on else None,
        g_pn_all.reshape(n_steps, batch, len(noise_idx)) if has_pn else None,
    )


_cl_core.defvjp(_cl_core_fwd, _cl_core_bwd)


@functools.partial(
    jax.jit,
    static_argnames=(
        "ode", "solver", "policy", "n_steps", "tau", "wrap_flags", "clip_fn",
        "obs_norms", "act_norms", "n_action", "traj_stride", "fast_wrap",
        "interpret", "pp_treedef", "obs_noise_cols", "proc_noise_idx",
        "act_constrain",
    ),
)
def fused_closed_loop(
    ode,
    solver: ExplicitRungeKutta,
    y0: tuple,
    policy,
    n_steps: int,
    tau: float,
    wrap_flags: tuple,
    obs_norms: tuple,
    act_norms: tuple,
    n_action: int,
    clip_fn=None,
    traj_stride: int = None,
    fast_wrap: bool = False,
    param_leaves: tuple = (),
    ref_leaves: tuple = (),
    policy_params=None,
    pp_treedef=None,
    policy_carry=None,
    obs_noise_tm=None,
    proc_noise_tm=None,
    obs_noise_cols: tuple = (),
    proc_noise_idx: tuple = (),
    act_constrain=None,
    interpret: bool = False,
):
    """Closed-loop rollout fully on-chip: ``policy(obs_tiles, step[,
    params]) -> normalized action tiles`` evaluated inside the kernel every
    step.

    Args (beyond :func:`_launch`'s contract): ``policy`` is a jittable
    function over ``(rows, 128)`` tiles — obs leaves are the normalized
    state fields in declaration order followed by the normalized tracked
    references (``ref_leaves``, tuple of ``(B,)`` arrays) — returning
    ``n_action`` normalized action tiles; elementwise or scalar-weight
    compositions (PD laws, gain schedules, small unrolled MLPs) all work.
    ``obs_norms``/``act_norms`` are per-leaf/dim ``(min, max)`` scalars.
    ``policy_params`` (with its static ``pp_treedef``) is the flattened
    scalar vector of a policy-parameter pytree, streamed through SMEM and
    re-assembled in-kernel — pass it to make the loop DIFFERENTIABLE w.r.t.
    the policy (checkpointed-recompute VJP, like the open-loop kernels).
    ``policy_carry`` (tuple of ``(B,)`` float leaves) makes the policy
    STATEFUL: the leaves ride VMEM planes exactly like the integration
    state (zero HBM traffic) and the call contract becomes
    ``policy(obs, step, carry[, params]) -> (action_tuple, carry_tuple)``
    — PI/PID integrators, low-pass filters, and other recurrent laws run
    in-kernel; the VJP extends to the carry (gradients flow into
    ``policy_carry`` and through it into ``policy_params``).

    Stochastic loops stream pre-scaled draw slabs: ``obs_noise_tm``
    (``(n_steps, B, len(obs_noise_cols))``, added to the indexed observation
    columns BEFORE the policy — pre-shift so row ``i`` is what the policy
    sees at step ``i``) and ``proc_noise_tm`` (``(n_steps, B,
    len(proc_noise_idx))`` Euler–Maruyama increments applied after wrap/clip
    like the open-loop kernel).  The VJP extends to both slabs
    (reparameterized noise gradients).

    Returns ``final_state_tuple`` — or, with ``traj_stride``,
    ``(final_tuple, traj_state_tuple, traj_action_tuple)`` where trajectory
    leaves have shape ``(B, n_steps // traj_stride)``.  With
    ``policy_carry``: ``(final_tuple, final_carry_tuple)`` /
    ``(final, final_carry, traj_state, traj_action, traj_carry)``.
    """
    # validate here, not only in _cl_launch: the VJP forward launches with
    # the checkpoint stride instead of traj_stride, so an invalid stride must
    # fail identically with and without a surrounding grad transform
    if traj_stride is not None and n_steps % traj_stride != 0:
        raise ValueError("n_steps must be divisible by traj_stride")
    return _cl_core(
        ode, solver, policy, n_steps, tau, wrap_flags, obs_norms, act_norms,
        n_action, clip_fn, traj_stride, fast_wrap, interpret, pp_treedef,
        tuple(obs_noise_cols), tuple(proc_noise_idx), act_constrain,
        y0, tuple(param_leaves), tuple(ref_leaves), policy_params,
        None if policy_carry is None else tuple(policy_carry),
        obs_noise_tm, proc_noise_tm,
    )


def supports_fused_closed_loop(env) -> bool:
    """Scope of the closed-loop kernel: generic fused scope PLUS scalar
    physical/action normalizations (they fold into the in-kernel obs/denorm
    arithmetic as compile-time constants)."""
    norms = jax.tree_util.tree_leaves(env.env_properties.physical_normalizations) + jax.tree_util.tree_leaves(
        env.env_properties.action_normalizations
    )
    return (
        supports_fused_rollout(env)
        # stochastic envs ARE in scope: the pre-pass computes the rollout
        # draw stream (CoreEnvironment._noise_slabs) and streams the
        # pre-scaled sensor/process slabs into the kernel — sensor rows are
        # added to the observation tiles BEFORE the policy, so the control
        # loop closes over the NOISY measurements exactly like the scan
        and all(np.isscalar(leaf) for leaf in norms)
        # the kernel builds observations from the integrated leaves in their
        # declaration order — it must equal generate_observation's column order
        and tuple(env._physical_field_names) == tuple(env._ode_state_fields)
    )


def env_fused_closed_loop(
    env,
    init_state,
    policy,
    n_steps: int,
    obs_stride: int = None,
    interpret: bool = False,
    return_traj_states: bool = False,
    policy_params=None,
    policy_carry=None,
):
    """Environment-level closed-loop kernel rollout.

    ``policy(obs_tuple, step) -> action_tuple`` runs on tiles inside the
    kernel (see :func:`fused_closed_loop`); obs leaves follow
    ``generate_observation``'s column order (normalized physical fields,
    then the tracked ``control_state`` references).  Returns
    ``(final_state,)``-style ``(obs, final_state)`` like the open-loop
    wrapper — or, with ``obs_stride``, ``(obs_traj, actions_traj,
    final_state)`` with ``actions_traj`` of shape
    ``(B, n_saves, action_dim)`` (normalized, as the policy emitted them).
    Raises out of scope (no silent fallback: a closed loop cannot be
    replayed through the open-loop scan without re-evaluating the policy
    per step — use ``RolloutCollector.collect_policy`` there).

    ``policy_carry`` (tuple of ``(B,)`` float leaves) makes the policy
    STATEFUL — ``policy(obs, step, carry[, params]) -> (action, carry)``
    with the carry VMEM-resident between steps (PI/PID integrators,
    low-pass filters, recurrent laws at kernel speed); every return shape
    then gains the final carry tuple as its last element, and the
    checkpointed-recompute VJP extends through the carry.

    Stochastic envs (``process_noise``/``observation_noise``) stay at kernel
    speed: the XLA pre-pass computes the rollout draw stream
    (``CoreEnvironment._noise_slabs`` — the scan path's exact ``split(key,
    3)`` chain, or the time-parallel counter stream for
    ``noise_mode="fast"``), pre-scales it, and streams it into the kernel —
    the policy closes the loop over the NOISY observations (output-feedback
    control under sensor noise), matching the slab-consuming scan fallback
    (``utils.collect.tile_policy_scan``) draw for draw.  The VJP extends
    through both slabs (reparameterized gradients), so ``train_policy``
    tunes noise-robust controllers at kernel speed.
    """
    if return_traj_states and obs_stride is None:
        raise ValueError("return_traj_states requires obs_stride")
    if not supports_fused_closed_loop(env):
        raise ValueError(
            "env_fused_closed_loop out of kernel scope (generic fused scope "
            "plus scalar normalizations required); use "
            "RolloutCollector.collect_policy for the scan path"
        )
    from exciting_environments_tpu.core import structures

    cached = env.__dict__.get("_fused_tile_ode")
    if cached is None:
        cached = _batched_param_closure(env)
        env.__dict__["_fused_tile_ode"] = cached
    tile_ode, param_leaves = cached

    y0 = tuple(jnp.asarray(getattr(init_state.physical_state, n)) for n in env._ode_state_fields)
    wrap_flags = tuple(n in env._angle_fields for n in env._ode_state_fields)
    clip_fn_raw = env._clip_state if type(env)._clip_state is not CoreEnvironment._clip_state else None
    pn = env.env_properties.physical_normalizations
    obs_norms = tuple(
        (float(getattr(pn, n).min), float(getattr(pn, n).max)) for n in env._ode_state_fields
    )
    an = env.env_properties.action_normalizations
    from dataclasses import fields as _dc_fields

    act_norms = tuple(
        (float(getattr(an, f.name).min), float(getattr(an, f.name).max))
        for f in _dc_fields(an)
    )
    # normalized tracked references, constant along the rollout
    ref_leaves = tuple(
        jnp.asarray(
            getattr(pn, name).normalize(jnp.asarray(getattr(init_state.reference, name)))
        )
        for name in env.control_state
    )

    pp_flat = pp_unravel = None
    if policy_params is not None:
        # flatten the user's parameter pytree into the SMEM-streamed vector;
        # with params given, the policy signature is policy(obs, t, params)
        # and the whole loop is differentiable w.r.t. them
        pp_flat, pp_unravel = _cached_unravel(policy_params)
    has_carry = policy_carry is not None

    # stochastic envs: precompute the rollout draw stream (shared
    # CoreEnvironment._noise_slabs — identical to the slab-consuming scan
    # fallback in utils.collect.tile_policy_scan), pre-scale, and stream
    obs_noise_tm = proc_noise_tm = None
    obs_noise_cols: tuple = ()
    proc_noise_idx: tuple = ()
    eps_obs = final_keys = keys_saves = None
    if getattr(env, "_has_noise", False):
        keys0 = env._require_noise_key(init_state)
        # sensor draws feed the POLICY every step -> slab stride is 1
        # regardless of the trajectory save stride
        eps_proc, eps_obs, keys_saves, final_keys = env._noise_slabs(keys0, n_steps, 1)
        if eps_proc is not None:
            proc_items = sorted(env._process_noise.items())
            coef = jnp.asarray(
                [s for _, s in proc_items], dtype=eps_proc.dtype
            ) * jnp.sqrt(env.tau)
            proc_noise_tm = jnp.transpose(coef * eps_proc, (1, 0, 2))
            proc_noise_idx = tuple(env._ode_state_fields.index(n) for n, _ in proc_items)
        if eps_obs is not None:
            # kernel scope guarantees scalar normalization spans, so the
            # normalized sigmas are compile-time floats; only the noisy
            # columns are streamed.  The slab is shifted one step: the obs
            # the policy sees at step i is step i-1's post-step measurement
            # (the scan fallback's obs0 is the exact reset observation)
            layout = env._obs_noise_layout
            sigmas = env._obs_noise_sigma_norm(env.env_properties)
            noisy = tuple(
                (k, col) for k, (col, name) in enumerate(layout)
                if name in env._observation_noise
            )
            obs_noise_cols = tuple(col for _k, col in noisy)
            scaled = jnp.stack(
                [float(sigmas[k]) * eps_obs[..., k] for k, _col in noisy], axis=-1
            )
            scaled_tm = jnp.transpose(scaled, (1, 0, 2))  # (T, B, n)
            obs_noise_tm = jnp.concatenate(
                [jnp.zeros_like(scaled_tm[:1]), scaled_tm[:-1]], axis=0
            )
    result = fused_closed_loop(
        tile_ode,
        env._solver,
        y0,
        policy,
        n_steps,
        env.tau,
        wrap_flags,
        obs_norms,
        act_norms,
        env.action_dim,
        clip_fn=clip_fn_raw,
        traj_stride=obs_stride,
        fast_wrap=getattr(env, "fast_math", False),
        param_leaves=param_leaves,
        ref_leaves=ref_leaves,
        policy_params=pp_flat,
        pp_treedef=pp_unravel,
        policy_carry=None if policy_carry is None else tuple(policy_carry),
        obs_noise_tm=obs_noise_tm,
        proc_noise_tm=proc_noise_tm,
        obs_noise_cols=obs_noise_cols,
        proc_noise_idx=proc_noise_idx,
        act_constrain=env._constrain_action_tuple,
        interpret=interpret,
    )
    final_carry = None
    if obs_stride is None:
        if has_carry:
            y_final, final_carry = result
        else:
            y_final = result
        traj_state_t = traj_act_t = None
    elif has_carry:
        y_final, final_carry, traj_state_t, traj_act_t, _traj_carry_t = result
    else:
        y_final, traj_state_t, traj_act_t = result

    # FSAL carry reconstruction for pytree-structure parity with the scan
    # path (env.step re-initializes the carry every step, so the VALUE is
    # informational — see _ode_solver_step).  With a trajectory the last
    # saved action IS the final step's action (exact); without one the
    # pre-final-step observation is unavailable, so the carry is evaluated
    # under the policy's action at the FINAL state — structurally identical.
    if not env._solver.fsal:
        solver_carry = None
    else:
        if traj_act_t is not None:
            a_norm_last = tuple(a[:, -1] for a in traj_act_t)
        else:
            obs_leaves = tuple(
                2 * (jnp.asarray(leaf) - mn) / (mx - mn) - 1
                for leaf, (mn, mx) in zip(y_final, obs_norms)
            ) + ref_leaves
            if has_carry:
                # post-final carry (the pre-final one is not retained) —
                # structural parity only, like the stateless branch below
                pol_args = (obs_leaves, n_steps - 1, final_carry)
            else:
                pol_args = (obs_leaves, n_steps - 1)
            out_last = (
                policy(*pol_args, policy_params)
                if policy_params is not None
                else policy(*pol_args)
            )
            a_norm_last = out_last[0] if has_carry else out_last
        a_phys_last = jnp.stack(
            [(a + 1) / 2 * (mx - mn) + mn for a, (mn, mx) in zip(a_norm_last, act_norms)],
            axis=-1,
        )
        a_phys_last = env._constrained_phys_action(a_phys_last)
        solver_carry = _final_solver_state(env, y_final, a_phys_last)

    key_kwargs = {} if final_keys is None else {"PRNGKey": final_keys}
    final_state = structures.replace(
        init_state,
        physical_state=env.PhysicalState(**dict(zip(env._ode_state_fields, y_final))),
        additions=env.Additions(
            solver_state=solver_carry,
            active_solver_state=jnp.full(env.batch_size, True),
        ),
        **key_kwargs,
    )
    obs_final = jax.vmap(env.generate_observation, in_axes=(0, env.in_axes_env_properties))(
        final_state, env.env_properties
    )
    if eps_obs is not None:
        # the returned observation is the final step's post-step measurement
        # — that step's own sensor draw, exactly like the scan path
        obs_final = _apply_obs_noise_slab(env, obs_final, eps_obs[:, -1])
    if obs_stride is None:
        if has_carry:
            return obs_final, final_state, final_carry
        return obs_final, final_state

    n_saves = n_steps // obs_stride
    traj_state = structures.replace(
        final_state,
        physical_state=env.PhysicalState(**dict(zip(env._ode_state_fields, traj_state_t))),
        # stochastic envs: each save carries ITS step's advanced key (scan
        # parity — resuming from a saved state must not replay consumed
        # draws); deterministic envs keep the unchanged initial key
        PRNGKey=(
            keys_saves[:, obs_stride - 1 :: obs_stride]
            if keys_saves is not None
            else (
                lambda key: jnp.broadcast_to(
                    key[:, None, ...], (env.batch_size, n_saves) + key.shape[1:]
                )
            )(jnp.asarray(init_state.PRNGKey))
        ),
        additions=env.Additions(
            solver_state=None,
            active_solver_state=jnp.full((env.batch_size, n_saves), True),
        ),
        reference=jax.tree_util.tree_map(
            lambda leaf: jnp.broadcast_to(jnp.asarray(leaf)[:, None], (env.batch_size, n_saves)),
            init_state.reference,
        ),
    )
    obs_traj = jax.vmap(
        jax.vmap(env.generate_observation, in_axes=(0, None)),
        in_axes=(0, env.in_axes_env_properties),
    )(traj_state, env.env_properties)
    if eps_obs is not None:
        # each saved observation carries its own step's sensor draw
        obs_traj = _apply_obs_noise_slab(
            env, obs_traj, eps_obs[:, obs_stride - 1 :: obs_stride]
        )
    actions_traj = jnp.stack(traj_act_t, axis=-1)
    if return_traj_states:
        if has_carry:
            return obs_traj, actions_traj, traj_state, final_state, final_carry
        return obs_traj, actions_traj, traj_state, final_state
    if has_carry:
        return obs_traj, actions_traj, final_state, final_carry
    return obs_traj, actions_traj, final_state
