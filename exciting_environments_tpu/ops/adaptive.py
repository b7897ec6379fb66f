"""Batched adaptive step-size integration (per-instance error control).

Fixed-step solving (the reference's only mode) wastes steps on easy
trajectories and under-resolves hard ones.  This module adds a PI-controlled
adaptive integrator in the style of torchode (Lienen & Günnemann, 2022): the
whole batch advances inside ONE ``lax.while_loop``, but every instance keeps
its **own** time, step size and acceptance state, so stiff and smooth
trajectories in the same batch each take as many steps as they need — with
no host synchronization and full ``vmap``-free batching (all comparisons are
elementwise masks).

Usage is solver-level (continuous vector fields; ZOH action discontinuities
would defeat the smoothness assumption behind the controller):

    y, stats = adaptive_solve(Tsit5(), f, y0, args, t0=0.0, t1=1.0,
                              rtol=1e-6, atol=1e-8)

``y0`` leaves may be scalars or ``(B,)`` arrays; ``args`` follow the usual
broadcasting rules.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from exciting_environments_tpu.core.structures import pytree_dataclass


@pytree_dataclass
class AdaptiveStats:
    """Per-instance integration statistics."""

    accepted: jax.Array
    rejected: jax.Array
    final_dt: jax.Array


def _error_ratio(y, y_new, err, rtol, atol):
    """Max over state leaves of |err| / (atol + rtol*max(|y|,|y_new|))."""
    ratios = []
    for leaf, leaf_new, leaf_err in zip(
        jax.tree_util.tree_leaves(y),
        jax.tree_util.tree_leaves(y_new),
        jax.tree_util.tree_leaves(err),
    ):
        scale = atol + rtol * jnp.maximum(jnp.abs(leaf), jnp.abs(leaf_new))
        ratios.append(jnp.abs(leaf_err) / scale)
    out = ratios[0]
    for r in ratios[1:]:
        out = jnp.maximum(out, r)
    return out


def adaptive_solve(
    solver,
    f,
    y0,
    args,
    t0: float,
    t1: float,
    rtol: float = 1e-6,
    atol: float = 1e-8,
    dt0: float = None,
    max_steps: int = 10_000,
    safety: float = 0.9,
    min_factor: float = 0.2,
    max_factor: float = 5.0,
):
    """Integrate ``dy/dt = f(t, y, args)`` from ``t0`` to ``t1`` with
    per-instance adaptive steps.

    Args:
        solver: an embedded-pair solver (``Tsit5`` or ``Dopri5``).
        f: vector field over pytree states (leaves scalar or ``(B,)``).
        y0: initial state pytree.
        args: parameters forwarded to ``f``.
        t0, t1: integration interval (shared; instances finish independently).
        rtol, atol: tolerance of the embedded local-error test.
        dt0: initial step (default ``(t1 - t0) / 100``).
        max_steps: hard iteration bound for the while loop.
        safety, min_factor, max_factor: standard step controller parameters.

    Returns:
        ``(y_final, AdaptiveStats)``.
    """
    if getattr(solver, "b_err", None) is None:
        raise ValueError(f"{type(solver).__name__} has no embedded error estimate")
    if dt0 is None:
        dt0 = (t1 - t0) / 100.0

    # per-instance scalars broadcast against the state's batch shape; scalar
    # state leaves are broadcast up front so the while_loop carry is stable
    proto = jnp.zeros(jnp.broadcast_shapes(*[jnp.shape(l) for l in jax.tree_util.tree_leaves(y0)]))
    y0 = jax.tree_util.tree_map(lambda leaf: jnp.broadcast_to(leaf, proto.shape).astype(jnp.result_type(leaf, proto)), y0)
    t = proto + t0
    dt = proto + dt0
    accepted = jnp.zeros_like(proto, dtype=jnp.int32)
    rejected = jnp.zeros_like(proto, dtype=jnp.int32)
    inv_order = 1.0 / solver.order
    # FSAL: an accepted step's final stage IS the next step's first stage
    # (valid per instance because the vector field is elementwise over the
    # batch, like everything else in this controller)
    fsal = bool(getattr(solver, "fsal", False))
    k0 = f(t, y0, args)

    def cond(carry):
        i, t, dt, y, k0, accepted, rejected = carry
        return jnp.logical_and(i < max_steps, jnp.any(t < t1))

    def body(carry):
        i, t, dt, y, k0, accepted, rejected = carry
        active = t < t1
        dt_try = jnp.minimum(dt, t1 - t)  # don't overshoot the horizon
        dt_try = jnp.where(active, dt_try, dt)

        y_new, err, k_end = solver.step_with_error(
            f, t, t + dt_try, y, args, dt=dt_try, k0=k0 if fsal else None
        )
        ratio = _error_ratio(y, y_new, err, rtol, atol)
        # a non-finite trial step (overflowing dynamics) counts as infinitely
        # wrong: reject and shrink by min_factor instead of poisoning dt
        ratio = jnp.where(jnp.isfinite(ratio), ratio, jnp.inf)
        accept = jnp.logical_and(ratio <= 1.0, active)

        sel = lambda old, new: jnp.where(jnp.broadcast_to(accept, jnp.shape(new)), new, old)
        y = jax.tree_util.tree_map(sel, y, y_new)
        if fsal:
            k0 = jax.tree_util.tree_map(sel, k0, k_end)
        t = jnp.where(accept, t + dt_try, t)
        accepted = accepted + accept.astype(jnp.int32)
        rejected = rejected + jnp.logical_and(active, ~accept).astype(jnp.int32)

        factor = jnp.clip(safety * ratio ** (-inv_order), min_factor, max_factor)
        dt = jnp.where(active, dt_try * factor, dt)
        return (i + 1, t, dt, y, k0, accepted, rejected)

    _, t, dt, y, k0, accepted, rejected = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), t, dt, y0, k0, accepted, rejected)
    )
    return y, AdaptiveStats(accepted=accepted, rejected=rejected, final_dt=dt)
