"""TPU-native trajectory integration engine.

Replaces the reference's per-environment ``diffrax.diffeqsolve`` calls
(e.g. ``/root/reference/exciting_environments/pendulum/pendulum_env.py:226-235``)
with one shared ``jax.lax.scan`` loop built on the in-house solvers
(:mod:`exciting_environments_tpu.ops.solvers`).

Why scan instead of a while-loop ODE driver: every environment in this
framework integrates with a *constant* step size and saves on a uniform grid
(reference ``SaveAt(ts=linspace(...))`` with ``dt0 = obs_stepsize``), so the
trajectory is a statically-shaped scan — XLA unrolls it into a single fused
device loop with O(1) carry, no host round-trips, and full compatibility with
``vmap`` (batch) and ``shard_map`` (mesh-sharded batch).

Step times are precomputed host-side in float64 (``t_k = k * obs_stepsize``)
instead of accumulated on device; zero-order-hold action lookup divides the
step time by ``action_stepsize`` exactly like the reference
(``pendulum_env.py:215-216``), including jnp's clamping gather semantics at
the trajectory end.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def zoh_action(actions, action_stepsize: float) -> Callable:
    """Zero-order-hold interpolation of an action sequence.

    ``actions`` has shape ``(n_action_steps, action_dim)``; the returned
    callable maps a (traced) time ``t`` to the action row active at ``t``.
    Indexing uses the same truncating ``int(t / action_stepsize)`` cast as the
    reference, and jnp gathers clamp out-of-range indices — both properties
    are relied upon by multistage solvers whose final stages probe ``t == t1``.
    """

    def action(t):
        # Guard the floor against division jitter: t is within a few ulps of
        # an exact grid point (k * obs_stepsize), so fl(t / action_stepsize)
        # can land infinitesimally BELOW the mathematical quotient and floor
        # to the previous action (observed as a one-step wrong action after
        # ~4000 steps in float64).  A relative epsilon far below the smallest
        # solver stage fraction absorbs it; jnp gathers clamp at the end.
        kq = t / action_stepsize
        kq = kq + (4 * jnp.finfo(jnp.result_type(kq)).eps) * jnp.abs(kq)
        return actions[jnp.floor(kq).astype(int)]

    return action


def solve_trajectory(solver, f: Callable, y0, args, n_steps: int, obs_stepsize: float):
    """Integrate ``n_steps`` fixed steps of size ``obs_stepsize`` from ``t=0``.

    Args:
        solver: an :class:`~exciting_environments_tpu.ops.solvers.ODESolver`.
        f: vector field ``f(t, y, args) -> dy`` (pytree-valued).
        y0: initial state pytree (tuple of scalars, or batched arrays).
        args: static parameters forwarded to ``f``.
        n_steps: number of solver steps (static Python int).
        obs_stepsize: step size == observation sampling interval.

    Returns:
        ``(ys, y_last)`` where ``ys`` is the time-major trajectory pytree with
        leading axis ``n_steps + 1`` (the initial state included, mirroring the
        reference's ``SaveAt`` grid of ``1 + t1/obs_stepsize`` points) and
        ``y_last`` is the final state.
    """
    # Host-side f64 step-start times: avoids on-device accumulation drift in
    # the ZOH index computation over long horizons.
    ts = jnp.asarray(np.arange(n_steps, dtype=np.float64) * obs_stepsize)

    carry0 = solver.init(f, 0.0, obs_stepsize, y0, args)

    def body(carry, t):
        y, solver_carry = carry
        # dt passed explicitly: fl(t + h) - t can differ from h by one ulp,
        # which chaotic systems amplify — with the exact dt the trajectory is
        # bit-identical to the re-anchored step loop for one-stage solvers.
        y1, solver_carry1 = solver.step(f, t, t + obs_stepsize, y, args, solver_carry, dt=obs_stepsize)
        return (y1, solver_carry1), y1

    (y_last, _), ys_tail = jax.lax.scan(body, (y0, carry0), ts)

    ys = jax.tree_util.tree_map(
        lambda y0_leaf, tail: jnp.concatenate([jnp.asarray(y0_leaf)[None], tail], axis=0),
        y0,
        ys_tail,
    )
    return ys, y_last


def step_loop(solver, f: Callable, y0, args, n_steps: int, tau: float):
    """Repeatedly apply the single-step protocol (each step over ``[0, tau]``).

    This mirrors the reference's *user-side* hot loop (``README.md:28-31``)
    where every control step re-anchors time at zero; it is primarily used by
    tests cross-checking step-mode against :func:`solve_trajectory`.
    """
    carry0 = solver.init(f, 0.0, tau, y0, args)

    def body(carry, _):
        y, solver_carry = carry
        y1, solver_carry1 = solver.step(f, 0.0, tau, y, args, solver_carry)
        return (y1, solver_carry1), y1

    (y_last, _), ys = jax.lax.scan(body, (y0, carry0), None, length=n_steps)
    return ys, y_last
