"""Batched adaptive step-size integration (per-instance error control).

Fixed-step solving (the reference's only mode) wastes steps on easy
trajectories and under-resolves hard ones.  This module adds a PI-controlled
adaptive integrator in the style of torchode (Lienen & Günnemann, 2022): the
whole batch advances inside ONE ``lax.while_loop``, but every instance keeps
its **own** time, step size and acceptance state, so stiff and smooth
trajectories in the same batch each take as many steps as they need — with
no host synchronization and full ``vmap``-free batching (all comparisons are
elementwise masks).

Two entry points:

* :func:`adaptive_solve` — solver-level, one smooth vector field:

      y, stats = adaptive_solve(Tsit5(), f, y0, args, t0=0.0, t1=1.0,
                                rtol=1e-6, atol=1e-8)

  ``y0`` leaves may be scalars or ``(B,)`` arrays; ``args`` follow the usual
  broadcasting rules.

* :func:`adaptive_rollout` — environment-level, across a zero-order-hold
  action sequence: each hold interval (inside which the field is smooth) is
  integrated adaptively, with the step proposal warm-started between
  intervals, so stiff parameter regions are resolved correctly where the
  fixed-step paths take exactly one solver step per ``tau``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from exciting_environments_tpu.core.structures import pytree_dataclass


@pytree_dataclass
class AdaptiveStats:
    """Per-instance integration statistics.

    ``incomplete`` flags instances whose while-loop hit the ``max_steps``
    bound before reaching the end time — their state is only integrated up
    to some ``t < t1`` and must not be trusted silently.
    """

    accepted: jax.Array
    rejected: jax.Array
    final_dt: jax.Array
    incomplete: jax.Array


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
    y, dt, t_end, accepted, rejected = _adaptive_interval(
        solver, f, y0, args, proto + t0, proto + t1, proto + dt0,
        rtol, atol, max_steps, safety, min_factor, max_factor,
    )
    return y, AdaptiveStats(
        accepted=accepted, rejected=rejected, final_dt=dt, incomplete=t_end < t1
    )


def _adaptive_interval(
    solver, f, y0, args, t, t1, dt, rtol, atol, max_steps, safety, min_factor, max_factor
):
    """PI-controlled integration of one smooth interval; all of ``t``,
    ``t1``, ``dt`` are per-instance arrays, ``y0`` leaves match their shape.

    Returns ``(y, dt, t, accepted, rejected)`` with ``dt`` the controller's
    final step proposal (warm start for a following interval) and ``t`` the
    per-instance time actually reached (``< t1`` iff the ``max_steps`` bound
    was hit first).
    """
    accepted = jnp.zeros_like(t, dtype=jnp.int32)
    rejected = jnp.zeros_like(t, dtype=jnp.int32)
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
        dt_prop = dt_try * factor
        # a step clipped only by the horizon (dt_try = t1 - t < dt) and then
        # accepted says nothing against the pre-clip proposal: keep the
        # larger of the two, or the warm start across ZOH intervals would
        # collapse to each interval's tiny remainder step
        clipped = dt_try < dt
        dt_prop = jnp.where(jnp.logical_and(clipped, accept), jnp.maximum(dt_prop, dt), dt_prop)
        dt = jnp.where(active, dt_prop, dt)
        return (i + 1, t, dt, y, k0, accepted, rejected)

    _, t, dt, y, k0, accepted, rejected = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), t, dt, y0, k0, accepted, rejected)
    )
    return y, dt, t, accepted, rejected


def adaptive_rollout(
    env,
    init_state,
    actions_norm,
    rtol: float = 1e-6,
    atol: float = 1e-8,
    solver=None,
    dt0: float = None,
    max_steps_per_interval: int = 1_000,
    safety: float = 0.9,
    min_factor: float = 0.2,
    max_factor: float = 5.0,
    env_properties=None,
):
    """Environment-level adaptive rollout: integrate the env dynamics across
    a zero-order-hold action sequence with per-instance adaptive steps.

    The fixed-step paths (``vmap_rollout``, the fused kernels) take exactly
    one solver step per control interval ``tau``; for stiff parameter
    regions that silently under-resolves the dynamics.  Here each hold
    interval — inside which the vector field is smooth — is integrated by
    the PI-controlled embedded solver of :func:`adaptive_solve`, with the
    step proposal warm-started across intervals (torchode-style per-instance
    state: a stiff and a smooth instance in the same batch take different
    step counts, with no host sync).  Angle wrapping and post-step clipping
    (e.g. the fluid tank's ``h >= 0``) apply at interval boundaries, exactly
    where the fixed-step path applies them.

    Args:
        env: a classic ODE environment (scalar or per-batch ``(B,)``
            parameters both work — the controller is elementwise).
        init_state: batched state from ``vmap_reset``.
        actions_norm: normalized actions ``(B, n_intervals, A)``; each is
            held for ``env.tau`` seconds.
        rtol, atol: local-error tolerances.
        solver: embedded-pair solver (default ``Tsit5()``).
        dt0: initial step proposal (default ``tau / 10``).
        max_steps_per_interval: while-loop bound per hold interval.
        safety, min_factor, max_factor: controller constants.
        env_properties: optional override of ``env.env_properties`` — used by
            the mesh-sharded wrapper to feed each shard its local slice of
            per-batch heterogeneous parameters.

    Returns:
        ``(obs, final_state, stats)`` — observations at the final time,
        the full environment ``State``, and per-instance
        :class:`AdaptiveStats` accumulated over the whole horizon.
    """
    from exciting_environments_tpu.core import structures
    from exciting_environments_tpu.core.env import CoreEnvironment
    from exciting_environments_tpu.ops.solvers import Tsit5

    if getattr(env, "_has_noise", False):
        raise ValueError(
            "adaptive_rollout integrates the deterministic dynamics only: the "
            "embedded pair's local-error estimate measures a smooth Taylor "
            "remainder, which an O(sigma*sqrt(h)) diffusion increment swamps "
            "— and adding noise only at accepted steps makes the path's law "
            "depend on the tolerance (see docs/parts/solvers.rst, 'Stochastic "
            "simulation', for the full argument incl. the Brownian-bridge "
            "machinery a principled adaptive SDE method needs).  Stochastic "
            "envs step through vmap_rollout/vmap_step at the fixed control "
            "rate."
        )

    # Environments whose step semantics go beyond "integrate the physical
    # state" (derived fields, action buffering, state-dependent action
    # constraints — e.g. the PMSM drive) provide their own interval loop
    # built on _adaptive_interval.
    custom = getattr(env, "_adaptive_rollout", None)
    if custom is not None:
        return custom(
            init_state,
            actions_norm,
            rtol=rtol,
            atol=atol,
            solver=solver,
            dt0=dt0,
            max_steps_per_interval=max_steps_per_interval,
            safety=safety,
            min_factor=min_factor,
            max_factor=max_factor,
            env_properties=env_properties,
        )

    solver = solver if solver is not None else Tsit5()
    if getattr(solver, "b_err", None) is None:
        raise ValueError(f"{type(solver).__name__} has no embedded error estimate")
    props = env_properties if env_properties is not None else env.env_properties
    params = props.static_params
    tau = float(env.tau)
    if dt0 is None:
        dt0 = tau / 10.0

    if len(env._ode_state_fields) != env.physical_state_dim:
        raise ValueError(
            f"adaptive_rollout supports environments whose physical state is "
            f"exactly the integrated ODE state; {type(env).__name__} carries "
            f"derived fields beyond {env._ode_state_fields} — implement "
            f"_adaptive_rollout on the environment (see the PMSM drive)"
        )

    batch, n_intervals, n_action = actions_norm.shape
    acts = jax.vmap(
        jax.vmap(env.denormalize_action, in_axes=(0, None)),
        in_axes=(0, env.in_axes_env_properties),
    )(actions_norm, props)
    acts = env._constrained_phys_action(acts)
    acts_tm = jnp.moveaxis(acts, 1, 0)  # (n_intervals, B, A)

    phys = init_state.physical_state
    y = tuple(jnp.asarray(getattr(phys, n)) for n in env._ode_state_fields)
    proto = jnp.zeros(batch, dtype=y[0].dtype)
    y = tuple(jnp.broadcast_to(leaf, proto.shape) for leaf in y)

    clip = type(env)._clip_state is not CoreEnvironment._clip_state

    def interval(carry, a_i):
        y, dt, t0, accepted, rejected, incomplete = carry
        act = tuple(a_i[:, j] for j in range(n_action))

        def f(t, yy, aa):
            return env._ode(t, yy, aa, lambda _t: act)

        y, dt, t_end, acc, rej = _adaptive_interval(
            solver, f, y, params, t0, t0 + tau, dt,
            rtol, atol, max_steps_per_interval, safety, min_factor, max_factor,
        )
        incomplete = jnp.logical_or(incomplete, t_end < t0 + tau)
        y = env._wrap_angles(y)
        if clip:
            y = env._clip_state(y)
        return (y, dt, t0 + tau, accepted + acc, rejected + rej, incomplete), None

    carry0 = (
        y,
        proto + dt0,
        proto,
        jnp.zeros(batch, jnp.int32),
        jnp.zeros(batch, jnp.int32),
        jnp.zeros(batch, bool),
    )
    (y, dt, _, accepted, rejected, incomplete), _ = jax.lax.scan(interval, carry0, acts_tm)

    final_state = structures.replace(
        init_state,
        physical_state=env.PhysicalState(**dict(zip(env._ode_state_fields, y))),
        additions=env.Additions(
            solver_state=None,
            active_solver_state=jnp.full(batch, True),
        ),
    )
    obs = jax.vmap(env.generate_observation, in_axes=(0, env.in_axes_env_properties))(
        final_state, props
    )
    return obs, final_state, AdaptiveStats(
        accepted=accepted, rejected=rejected, final_dt=dt, incomplete=incomplete
    )
