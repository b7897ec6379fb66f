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

Scope: the classic ODE environments (elementwise vector fields, scalar
static parameters) with carry-free explicit solvers (Euler, Heun, Midpoint,
RK4) — step semantics are then identical to repeated ``vmap_step`` calls.
FSAL solvers, per-batch heterogeneous parameters and the PMSM (LUT gathers,
deadtime buffers) transparently fall back to the XLA scan path.
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


def _rk_step(ode, solver: ExplicitRungeKutta, y, action, tau, t):
    """One explicit RK step on a tuple of (8, 128) tiles.

    Coefficient handling mirrors ``solvers._weighted_increment`` (skip zero
    terms, no multiply for unit coefficients) so Euler is exactly
    ``y + tau * f`` — bit-identical to the XLA step path.
    """

    def lincomb(yl, ks_for_leaf, coeffs):
        acc = None
        for c, k in zip(coeffs, ks_for_leaf):
            if c == 0.0:
                continue
            term = k if c == 1.0 else c * k
            acc = term if acc is None else acc + term
        return yl if acc is None else yl + tau * acc

    ks = [ode(t, y, action)]
    for row, c in zip(solver.a, solver.c[1:]):
        ti = t if c == 0.0 else t + c * tau
        yi = tuple(
            lincomb(yl, [k[j] for k in ks], row) for j, yl in enumerate(y)
        )
        ks.append(ode(ti, yi, action))
    return tuple(lincomb(yl, [k[j] for k in ks], solver.b) for j, yl in enumerate(y))


def _make_kernel(ode, solver, chunk, n_state, n_action, tau, wrap_flags, clip_fn, traj_stride, fast_wrap):
    """Kernel body over refs ``(actions, *state_in, *state_out[, *traj_out])``.

    The grid is ``(batch_tiles, time_chunks)`` with time innermost: the state
    output block (constant over the time axis) doubles as the carried state —
    it is initialized from the input block on the first chunk and revisited
    by every later chunk of the same batch tile, while Pallas double-buffers
    the per-chunk action DMA.  With ``traj_stride`` set, every
    ``traj_stride``-th post-step state is also written to per-leaf trajectory
    blocks of ``chunk // traj_stride`` rows.
    """

    def kernel(actions_ref, *refs):
        in_refs = refs[:n_state]
        state_refs = refs[n_state : 2 * n_state]
        traj_refs = refs[2 * n_state :]
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            for ref, src in zip(state_refs, in_refs):
                ref[:] = src[:]

        def body(i, y):
            action = _IndexableAction(tuple(actions_ref[i, a] for a in range(n_action)))
            step = k * chunk + i
            y1 = _rk_step(ode, solver, y, action, tau, step * tau)
            wrap_op = wrap_angle_fast if fast_wrap else (
                lambda leaf: ((leaf + jnp.pi) % (2 * jnp.pi)) - jnp.pi
            )
            y1 = tuple(
                wrap_op(leaf) if wrap else leaf for leaf, wrap in zip(y1, wrap_flags)
            )
            if clip_fn is not None:
                y1 = clip_fn(y1)
            if traj_stride is not None:

                @pl.when((i + 1) % traj_stride == 0)
                def _():
                    slot = (i + 1) // traj_stride - 1
                    for ref, leaf in zip(traj_refs, y1):
                        ref[slot] = leaf

            return y1

        y = tuple(ref[:] for ref in state_refs)
        y = jax.lax.fori_loop(0, chunk, body, y)
        for ref, leaf in zip(state_refs, y):
            ref[:] = leaf

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("ode", "solver", "n_steps", "tau", "wrap_flags", "clip_fn", "traj_stride", "fast_wrap", "time_major", "interpret"),
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
    interpret: bool = False,
):
    """Run ``n_steps`` fixed-``tau`` solver steps fully on-chip.

    Args:
        ode: ``ode(t, y_tuple, indexable_action) -> dy_tuple``, elementwise on
            (8, 128) tiles; static parameters closed over as Python scalars.
        solver: carry-free :class:`ExplicitRungeKutta` (tableau baked into
            the kernel).
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
        interpret: Pallas interpreter mode (for CPU testing).

    Returns:
        tuple of ``(B,)`` final state arrays; with ``traj_stride`` set, a pair
        ``(final_tuple, traj_tuple)`` where each trajectory leaf has shape
        ``(B, n_steps // traj_stride)``.
    """
    batch = y0[0].shape[0]
    if batch % TILE != 0:
        raise ValueError(f"batch {batch} must be a multiple of {TILE}")
    if solver.fsal:
        raise ValueError("fused_rollout supports carry-free solvers only")
    if traj_stride is not None and n_steps % traj_stride != 0:
        raise ValueError("n_steps must be divisible by traj_stride")
    n_state = len(y0)
    n_action = actions.shape[-1]
    if time_major and actions.shape[:2] != (n_steps, batch):
        raise ValueError(f"time_major actions must be (n_steps, B, A), got {actions.shape}")
    total_rows = batch // LANES

    # batch tile: as many (x, 128) rows as fit a ~1 MB/leaf VMEM budget
    rows = SUBLANES
    while rows * 2 <= total_rows and total_rows % (rows * 2) == 0 and rows < 64:
        rows *= 2
    n_batch_tiles = total_rows // rows

    # time chunk: largest divisor of n_steps keeping the action block <= ~2 MB
    # (Pallas double-buffers it) and compatible with the trajectory stride
    max_chunk = max(1, (2 * 1024 * 1024) // (n_action * rows * LANES * 4))
    chunk = 1
    for c in range(1, n_steps + 1):
        if n_steps % c == 0 and c <= max_chunk and (traj_stride is None or c % traj_stride == 0):
            chunk = c
    if traj_stride is not None and chunk % traj_stride != 0:
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

    kernel = _make_kernel(ode, solver, chunk, n_state, n_action, tau, wrap_flags, clip_fn, traj_stride, fast_wrap)

    def state_block():
        # constant over the time axis: the output block carries the state
        # across time chunks of the same batch tile
        return pl.BlockSpec((rows, LANES), lambda b, k: (b, 0), memory_space=pltpu.VMEM)

    dtype = y0_tiled[0].dtype
    out_specs = [state_block() for _ in range(n_state)]
    out_shape = [jax.ShapeDtypeStruct((total_rows, LANES), dtype) for _ in range(n_state)]
    if traj_stride is not None:
        saves_per_chunk = chunk // traj_stride
        n_saves = n_steps // traj_stride
        out_specs += [
            pl.BlockSpec(
                (saves_per_chunk, rows, LANES), lambda b, k: (k, b, 0), memory_space=pltpu.VMEM
            )
            for _ in range(n_state)
        ]
        out_shape += [
            jax.ShapeDtypeStruct((n_saves, total_rows, LANES), dtype) for _ in range(n_state)
        ]

    out = pl.pallas_call(
        kernel,
        grid=(n_batch_tiles, n_time_chunks),  # time innermost: state accumulates per tile
        in_specs=[
            pl.BlockSpec(
                (chunk, n_action, rows, LANES),
                lambda b, k: (k, 0, b, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        + [state_block() for _ in range(n_state)],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(actions_tiled, *y0_tiled)

    final = tuple(o.reshape(batch) for o in out[:n_state])
    if traj_stride is None:
        return final
    n_saves = n_steps // traj_stride
    traj = tuple(jnp.moveaxis(o.reshape(n_saves, batch), 0, 1) for o in out[n_state:])
    return final, traj


def supports_fused_rollout(env) -> bool:
    """Whether ``env`` is inside the fused kernel's scope."""
    param_leaves = jax.tree_util.tree_leaves(env.env_properties.static_params) + jax.tree_util.tree_leaves(
        env.env_properties.action_normalizations
    )
    return (
        all(np.isscalar(leaf) for leaf in param_leaves)
        and len(env._ode_state_fields) == env.physical_state_dim
        and env.batch_size % TILE == 0
        and isinstance(env._solver, ExplicitRungeKutta)
        and not env._solver.fsal
    )


def env_fused_rollout(
    env,
    init_state,
    actions_norm,
    obs_stride: int = None,
    time_major: bool = False,
    interpret: bool = False,
):
    """Environment-level fused rollout: normalized actions in, ``(obs, state)``
    out — numerically identical to the scan path for in-scope envs (final
    physical states bit-exact; observations may differ by 1 ulp in float32
    because the normalization fuses into a different XLA program);
    transparently falls back to the XLA scan path otherwise.

    With ``obs_stride`` set, every ``obs_stride``-th observation is returned,
    shape ``(B, n_steps // obs_stride, obs_dim)``; otherwise only the final
    observation ``(B, obs_dim)``.

    ``time_major=True`` takes actions ``(n_steps, B, A)`` — the layout the
    kernel streams, saving a full transposed copy of the slab per call (for
    peak sustained throughput also jit-wrap the call so the pre-passes fuse
    into one executable).  The fallback scan path transposes back.
    """
    n_steps = actions_norm.shape[0] if time_major else actions_norm.shape[1]
    if not supports_fused_rollout(env):
        if time_major:
            actions_norm = jnp.transpose(actions_norm, (1, 0, 2))
        obs, last_state = env.vmap_rollout(init_state, actions_norm, obs_stride or n_steps)
        if obs_stride is None:
            obs = obs[:, -1]
        return obs, last_state

    params = env.env_properties.static_params

    # denormalize once — a cheap XLA pre-pass over the action slab (the
    # leading two axes are (B, T) or (T, B); the double vmap peels both)
    actions = jax.vmap(
        jax.vmap(env.denormalize_action, in_axes=(0, None)), in_axes=(0, None)
    )(actions_norm, env.env_properties)

    # the tile ODE is cached on the env so the jitted kernel is reused across
    # calls (a fresh closure per call would miss the jit cache every time)
    tile_ode = env.__dict__.get("_fused_tile_ode")
    if tile_ode is None:

        def tile_ode(t, y, action):
            return env._ode(t, y, params, lambda _t: action)

        env.__dict__["_fused_tile_ode"] = tile_ode

    y0 = tuple(jnp.asarray(getattr(init_state.physical_state, n)) for n in env._ode_state_fields)
    wrap_flags = tuple(n in env._angle_fields for n in env._ode_state_fields)
    clip_fn = env._clip_state if type(env)._clip_state is not CoreEnvironment._clip_state else None

    result = fused_rollout(
        tile_ode,
        env._solver,
        y0,
        actions,
        n_steps,
        env.tau,
        wrap_flags,
        clip_fn=clip_fn,
        traj_stride=obs_stride,
        fast_wrap=getattr(env, "fast_math", False),
        time_major=time_major,
        interpret=interpret,
    )
    y_final, y_traj = result if obs_stride is not None else (result, None)

    from exciting_environments_tpu.core import structures

    final_state = structures.replace(
        init_state,
        physical_state=env.PhysicalState(**dict(zip(env._ode_state_fields, y_final))),
        additions=env.Additions(
            solver_state=None,  # carry-free solvers only (checked above)
            active_solver_state=jnp.full(env.batch_size, True),
        ),
    )
    if obs_stride is None:
        obs = jax.vmap(env.generate_observation, in_axes=(0, env.in_axes_env_properties))(
            final_state, env.env_properties
        )
        return obs, final_state

    # trajectory observations: vmap over (batch, time) on reconstructed states
    n_saves = n_steps // obs_stride
    traj_state = structures.replace(
        final_state,
        physical_state=env.PhysicalState(**dict(zip(env._ode_state_fields, y_traj))),
        PRNGKey=(
            lambda key: jnp.broadcast_to(
                key[:, None, ...], (env.batch_size, n_saves) + key.shape[1:]
            )
        )(jnp.asarray(init_state.PRNGKey)),
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
    )(traj_state, env.env_properties)
    return obs, final_state
