"""Fused Pallas TPU rollout kernels (performance layer)."""

from __future__ import annotations


def rollout_path(env, obs_stepsize: float = None, action_stepsize: float = None) -> str:
    """Which execution path a ``fused_rollout`` (or, with stepsizes given, a
    ``fused_sim_ahead``) call on ``env`` selects.

    Returns one of:

    * ``"pmsm_fused"`` — the dedicated PMSM drive kernel
      (:mod:`~exciting_environments_tpu.ops.pallas.pmsm_stepper`),
    * ``"fused"`` — the generic fused rollout kernel
      (:mod:`~exciting_environments_tpu.ops.pallas.stepper`),
    * ``"scan"`` — the XLA ``lax.scan`` fallback (10-100x slower; the fused
      entry points take ``strict=True`` to raise instead of riding it).

    ``env`` may be a :class:`~exciting_environments_tpu.core.env.CoreEnvironment`
    or a :class:`~exciting_environments_tpu.parallel.mesh.ShardedEnv` (whose
    per-shard tiling constraints are included in the answer).
    """
    from exciting_environments_tpu.models.pmsm.pmsm_env import PMSM
    from exciting_environments_tpu.parallel.mesh import ShardedEnv

    from .pmsm_stepper import supports_pmsm_fused
    from .stepper import supports_fused_rollout, supports_fused_sim_ahead

    sim_ahead = obs_stepsize is not None
    if isinstance(env, ShardedEnv):
        if not env._fused_in_scope(obs_stepsize if sim_ahead else None, action_stepsize):
            return "scan"
        return "pmsm_fused" if isinstance(env.env, PMSM) else "fused"

    if isinstance(env, PMSM):
        if supports_pmsm_fused(env) and (
            not sim_ahead
            or (
                obs_stepsize == action_stepsize
                # the trajectory solve is deterministic-only (vmap_sim_ahead
                # raises on stochastic envs; step-mode noise IS in scope)
                and not getattr(env, "_has_noise", False)
            )
        ):
            return "pmsm_fused"
        return "scan"
    in_scope = (
        supports_fused_sim_ahead(env, obs_stepsize, action_stepsize)
        if sim_ahead
        else supports_fused_rollout(env)
    )
    return "fused" if in_scope else "scan"


def select_closed_loop(env, interpret: bool):
    """The single closed-loop kernel dispatch rule, shared by
    :meth:`~exciting_environments_tpu.parallel.mesh.ShardedEnv.fused_closed_loop`
    and :meth:`RolloutCollector.collect_policy_fused`.

    Returns ``(kernel_fn, extra_kwargs)`` — the PMSM drive kernel with its
    interpret-aware gather choice for in-scope PMSM envs, the generic
    closed-loop kernel for in-scope classic envs, ``(None, {})`` when out of
    kernel scope (a closed loop has no open-loop fallback: callers raise).
    """
    from exciting_environments_tpu.models.pmsm.pmsm_env import PMSM

    from .pmsm_stepper import (
        pmsm_fused_closed_loop,
        supports_pmsm_fused_closed_loop,
    )
    from .stepper import env_fused_closed_loop, supports_fused_closed_loop

    if isinstance(env, PMSM):
        if not supports_pmsm_fused_closed_loop(env):
            return None, {}
        return pmsm_fused_closed_loop, {"gather": "take" if interpret else "int8"}
    if not supports_fused_closed_loop(env):
        return None, {}
    return env_fused_closed_loop, {}
