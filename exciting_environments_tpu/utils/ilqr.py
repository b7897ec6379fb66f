"""iLQR trajectory optimization through the env's own differentiable step.

Completes the planning triad of :mod:`exciting_environments_tpu.utils.mpc`:
MPPI explores by sampling, :func:`~exciting_environments_tpu.utils.mpc.optimize_actions`
descends first-order gradients, and :func:`ilqr_plan` is the second-order
classic — iterative LQR with the dynamics linearized by ``jax.jacobian`` of
the env's actual ``_ode_solver_step`` (the same no-hand-model construction
the EKF of :mod:`~exciting_environments_tpu.utils.estimate` uses) and the
stage cost quadratized by ``jax.hessian``.  Each batch instance solves its
own iLQR; the whole batch of backward Riccati sweeps + parallel-line-search
forward rollouts is ONE jitted program (``vmap`` over instances, ``lax.scan``
over both the horizon and the iterations).

Semantics match the sibling planners exactly: the default objective is the
negative sum of the env's own tracking rewards over the post-step states
(identical to ``mpc._trajectory_cost``'s default, up to the optional
``action_cost`` regularizer), actions live in the normalized [-1, 1] band
and are clipped inside the forward pass, and angle-state deviations feed the
feedback gains through their shortest circular representative so plans track
through the ±pi seam.

Robustness scheme (jit-friendly, fixed iteration count): Levenberg
regularization ``mu`` on ``Quu`` plus a parallel backtracking line search —
every candidate step size rolls out simultaneously (one more vmap axis) and
the iterate only moves if the best candidate improves the nominal cost, so
an indefinite quadratization can never make an accepted step worse.

Scope: any :class:`~exciting_environments_tpu.core.env.CoreEnvironment` —
classic envs and the PMSM drive alike (the dynamics and the default cost go
through the ``_state_from_normalized_physical`` / ``_advance_state`` hooks,
so the drive's linearizations include the inverter hexagon constraint and
the deadtime buffer swap).

No reference counterpart (the reference exposes no planning utilities).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from exciting_environments_tpu.utils import mpc
from exciting_environments_tpu.utils.estimate import (
    _angle_periods,
    _dynamics_fn,
    _phys_names,
    _wrap_diff,
)
from exciting_environments_tpu.utils.episodes import unwrap_sharded

__all__ = ["ilqr_plan"]


def _default_stage_cost(env, action_cost):
    """Negative env tracking reward at the post-step state (+ optional action
    energy) — ``mpc._trajectory_cost``'s default, stage by stage."""

    def cost(x_next_norm, u_norm, ref_norm, props):
        state = env._state_from_normalized_physical(x_next_norm, props, ref_norm=ref_norm)
        action = env.denormalize_action(u_norm, props)
        c = -jnp.reshape(env.generate_reward(state, action, props), ())
        if action_cost:
            c = c + action_cost * jnp.sum(u_norm**2)
        return c

    return cost


def ilqr_plan(
    env,
    state,
    actions,
    iterations: int = 10,
    *,
    mu: float = 1e-3,
    alphas: tuple = (1.0, 0.3, 0.1, 0.03, 0.01),
    action_cost: float = 1e-4,
    stage_cost: Callable = None,
) -> mpc.PlanResult:
    """Open-loop trajectory optimization by iterative LQR.

    Args:
        env: a batched :class:`~exciting_environments_tpu.core.env.CoreEnvironment`
            — classic or PMSM (or a ``ShardedEnv``
            wrapping one).  The default cost needs ``control_state`` and a
            state with set references (``episodes.reset_with_references``).
        state: batched state to plan from (references frozen during the plan,
            like every planner here).
        actions: initial normalized plan ``(batch_size, horizon, action_dim)``.
        iterations: iLQR iterations (backward sweep + line-searched forward).
        mu: initial Levenberg regularization added to ``Quu`` in the backward
            pass; adapted per iteration (÷3 on an accepted step, ×10 when the
            whole line search is rejected).
        alphas: parallel line-search step sizes; a candidate is only
            accepted if it improves the nominal cost, so iterates never
            regress regardless of the values given.
        action_cost: quadratic action-energy weight added to the default
            cost (keeps ``Quu`` positive-definite when the tracking reward
            ignores the action; set 0.0 for exact
            ``mpc._trajectory_cost`` parity).
        stage_cost: optional ``stage_cost(x_next_norm, u_norm, ref_norm,
            env_properties) -> scalar`` replacing the default (applied at
            each post-step state; ``action_cost`` is then ignored).

    Returns:
        :class:`~exciting_environments_tpu.utils.mpc.PlanResult`: optimized
        actions ``(batch_size, horizon, action_dim)`` and the batch-mean
        cost curve ``(iterations + 1,)`` (entry 0 = initial plan).
    """
    env, place = unwrap_sharded(env)
    state, actions = place(state), place(actions)
    if not hasattr(env, "_state_from_normalized_physical") or not hasattr(
        env, "_advance_state"
    ):
        raise TypeError(
            "ilqr_plan needs a CoreEnvironment (state reconstruction and the "
            f"differentiable _advance_state transition); got {type(env).__name__}"
        )
    mpc._check_cost_setup(env, stage_cost, state)
    B, A = env.batch_size, env.action_dim
    if actions.ndim != 3 or actions.shape[0] != B or actions.shape[2] != A:
        raise ValueError(
            f"actions must have shape (batch_size, horizon, action_dim) = "
            f"({B}, horizon, {A}), but {actions.shape} is given"
        )
    props = env.env_properties
    names = _phys_names(env)
    n, m = len(names), A
    periods = _angle_periods(env, props, names)
    cost_fn = stage_cost or _default_stage_cost(env, action_cost)
    alphas_arr = jnp.asarray(alphas)

    norm_state = env.normalize_state(state, props)
    x0_b = jnp.stack([getattr(norm_state.physical_state, nm) for nm in names], axis=-1)
    if env.control_state:
        ref_b = jnp.stack(
            [getattr(norm_state.reference, nm) for nm in env.control_state], axis=-1
        )
    else:
        ref_b = jnp.zeros((B, 0), x0_b.dtype)

    dyn = _dynamics_fn(env)

    # pass ONLY the per-batch property leaves through jit/vmap and close over
    # the scalars: structural flags (e.g. the PMSM's `saturated`, which gates
    # Python control flow in the vector field) must stay concrete, and the
    # scalar-vs-batched split is exactly create_in_axes_dataclass's rule
    prop_leaves, prop_treedef = jax.tree_util.tree_flatten(props)
    leaf_batched = tuple(
        getattr(l, "ndim", 0) > 0 and l.shape[0] == env.batch_size for l in prop_leaves
    )
    batched_leaves = tuple(l for l, b in zip(prop_leaves, leaf_batched) if b)

    def single(x0, u_init, batched_i, ref):
        it = iter(batched_i)
        merged = [next(it) if b else l for l, b in zip(prop_leaves, leaf_batched)]
        props_i = jax.tree_util.tree_unflatten(prop_treedef, merged)
        f = lambda x, u: dyn(x, u, props_i)
        l = lambda x_next, u: cost_fn(x_next, u, ref, props_i)
        g_z = lambda z: l(f(z[:n], z[n:]), z[n:])  # stage cost in (x_k, u_k)
        eye_m = jnp.eye(m, dtype=x0.dtype)

        def nominal_rollout(us):
            def roll(x, u):
                x1 = f(x, u)
                return x1, (x, l(x1, u))

            _, (xs, ls) = jax.lax.scan(roll, x0, us)
            return xs, jnp.sum(ls)  # xs[k] = pre-step state x_k

        def backward(xs, us, mu_k):
            def bstep(carry, inp):
                Vx, Vxx = carry
                x, u = inp
                Aj = jax.jacobian(f, argnums=0)(x, u)
                Bj = jax.jacobian(f, argnums=1)(x, u)
                z = jnp.concatenate([x, u])
                grad_g = jax.grad(g_z)(z)
                hess_g = jax.hessian(g_z)(z)
                Qx = grad_g[:n] + Aj.T @ Vx
                Qu = grad_g[n:] + Bj.T @ Vx
                Qxx = hess_g[:n, :n] + Aj.T @ Vxx @ Aj
                Quu = hess_g[n:, n:] + Bj.T @ Vxx @ Bj
                Qux = hess_g[n:, :n] + Bj.T @ Vxx @ Aj
                Quu_r = Quu + mu_k * eye_m
                kff = -jnp.linalg.solve(Quu_r, Qu)
                K = -jnp.linalg.solve(Quu_r, Qux)
                Vx_new = Qx + K.T @ Quu @ kff + K.T @ Qu + Qux.T @ kff
                Vxx_new = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
                Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
                return (Vx_new, Vxx_new), (kff, K)

            zero = (jnp.zeros((n,), x0.dtype), jnp.zeros((n, n), x0.dtype))
            _, (kffs, Ks) = jax.lax.scan(bstep, zero, (xs, us), reverse=True)
            return kffs, Ks

        def forward(xs, us, kffs, Ks, alpha):
            def fstep(carry, inp):
                x, J = carry
                u_nom, x_nom, kff, K = inp
                du = alpha * kff + K @ _wrap_diff(x - x_nom, periods)
                u = jnp.clip(u_nom + du, -1.0, 1.0)
                x1 = f(x, u)
                return (x1, J + l(x1, u)), (x, u)

            (_, J), (xs_new, us_new) = jax.lax.scan(
                fstep, (x0, jnp.zeros((), x0.dtype)), (us, xs, kffs, Ks)
            )
            return J, xs_new, us_new

        def iteration(carry, _):
            us, xs, J, mu_k = carry
            kffs, Ks = backward(xs, us, mu_k)
            # the line-search forwards re-emit their visited states, so the
            # accepted candidate's trajectory carries straight into the next
            # backward pass — no re-rollout of the nominal plan
            Js, xs_cand, us_cand = jax.vmap(lambda a: forward(xs, us, kffs, Ks, a))(alphas_arr)
            best = jnp.argmin(Js)
            improved = Js[best] < J
            us_next = jnp.where(improved, us_cand[best], us)
            xs_next = jnp.where(improved, xs_cand[best], xs)
            J_next = jnp.where(improved, Js[best], J)
            # Levenberg schedule: relax toward Newton on success, back off
            # toward (scaled) gradient descent when every step is rejected
            mu_next = jnp.where(improved, jnp.maximum(mu_k / 3.0, 1e-8),
                                jnp.minimum(mu_k * 10.0, 1e8))
            return (us_next, xs_next, J_next, mu_next), J

        xs0, J0 = nominal_rollout(u_init)
        (us_fin, _, J_fin, _), J_curve = jax.lax.scan(
            iteration, (u_init, xs0, J0, jnp.asarray(mu, x0.dtype)), length=iterations
        )
        return us_fin, jnp.concatenate([J_curve, J_fin[None]])

    solve = jax.jit(jax.vmap(single, in_axes=(0, 0, 0, 0)))
    us_opt, cost_curves = solve(x0_b, actions, batched_leaves, ref_b)
    return mpc.PlanResult(actions=us_opt, costs=jnp.mean(cost_curves, axis=0))
