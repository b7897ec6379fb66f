"""Model-predictive control, fully on-device (MPPI + gradient planning).

The reference packages environments as simulation models but ships no
planner; any MPC loop a consumer builds around it pays one host dispatch
per candidate rollout.  This module is the TPU-native counterpart: the
planner's sample sweep IS the batch axis.  An MPPI update evaluates
``n_samples`` candidate action sequences of length ``horizon`` for every
one of the env's ``batch_size`` instances — ``n_samples x batch_size x
horizon`` environment steps — as a single XLA program, and
:func:`run_mppi` folds the full receding-horizon control loop (plan,
apply first action, shift, repeat) into ONE jitted ``lax.scan``: a single
device dispatch no matter how many control steps, samples, or refinement
iterations it contains.

Design notes (TPU-first):

* Candidate rollouts reuse the exact step semantics of ``env.vmap_step``
  (a ``lax.scan`` of it), so the plan is optimized against precisely the
  dynamics the deployed loop will see — including PMSM deadtime and
  hexagon constraints, which live inside ``step``.
* Costs default to the negative sum of the env's own ``generate_reward``
  along the candidate trajectory (plan-to-maximize-reward); a custom
  ``cost_fn(obs, actions) -> (batch,)`` sees the whole normalized
  observation trajectory at once, so terminal costs and soft constraints
  are one expression away.
* MPPI weights are a temperature softmax over candidate costs per
  instance; candidates are clipped to the engine's normalized [-1, 1]
  action band *before* evaluation so the weighted average is always
  feasible.  Optional exponential smoothing colors the exploration noise
  along the horizon without changing its marginal variance.
* :func:`optimize_actions` is the gradient planner: the same rollout is
  differentiable end-to-end (plain ``lax.scan`` over ``vmap_step``), so a
  ``tanh``-parameterized action sequence is refined with optax inside one
  jitted ``lax.scan`` over optimizer steps.

No reference counterpart (the reference exposes no planning utilities).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from exciting_environments_tpu.utils import episodes
from exciting_environments_tpu.utils.episodes import unwrap_sharded


class MPPIConfig(NamedTuple):
    """Hyperparameters of the MPPI planner.

    ``horizon``: planning horizon in control steps.
    ``n_samples``: candidate action sequences evaluated per instance.
    ``temperature``: softmax temperature over candidate costs (lower =
    greedier averaging).
    ``noise_sigma``: exploration noise scale in normalized action units
    (scalar or per-dimension ``(action_dim,)``).
    ``n_iterations``: MPPI refinement iterations per plan (each re-samples
    around the updated mean).
    ``smoothing``: exponential noise smoothing coefficient in [0, 1);
    0 = white noise, larger values favor slowly-varying candidates.
    """

    horizon: int = 24
    n_samples: int = 256
    temperature: float = 0.05
    noise_sigma: float = 0.3
    n_iterations: int = 1
    smoothing: float = 0.0


class MPCResult(NamedTuple):
    """Outcome of :func:`run_mppi`.

    ``observations``: ``(batch_size, n_steps, obs_dim)`` — the observation
    *after* each applied action.  ``actions``: applied (first-plan-step)
    actions, ``(batch_size, n_steps, action_dim)``.  ``rewards``: env
    rewards of each applied step, ``(batch_size, n_steps)``.
    ``final_state``: batched state after the last step.  ``plan``: the
    final (shifted) mean plan, ``(batch_size, horizon, action_dim)``.
    """

    observations: jnp.ndarray
    actions: jnp.ndarray
    rewards: jnp.ndarray
    final_state: object
    plan: jnp.ndarray


class PlanResult(NamedTuple):
    """Outcome of :func:`optimize_actions`: the optimized normalized action
    sequence ``(batch_size, horizon, action_dim)`` and the per-iteration
    mean cost curve ``(iterations + 1,)`` (entry 0 = initial plan)."""

    actions: jnp.ndarray
    costs: jnp.ndarray


def _check_cost_setup(env, cost_fn, state=None):
    if cost_fn is None and not env.control_state:
        raise ValueError(
            "the default planning cost is the negative sum of the env's "
            "tracking rewards, which are identically zero without "
            "control_state — construct the env with control_state=[...] "
            "or pass an explicit cost_fn(obs, actions)"
        )
    # a bare vmap_reset leaves reference fields NaN (reference semantics,
    # core_env.py:361-391) and the tracking reward of a NaN reference is NaN
    # for every candidate — catch it here instead of returning NaN plans.
    # Host-side values only: inside a jit trace the leaves are tracers.
    if cost_fn is None and state is not None:
        for name in env.control_state:
            leaf = getattr(state.reference, name, None)
            if leaf is not None and not isinstance(leaf, jax.core.Tracer) and bool(
                jnp.isnan(jnp.asarray(leaf)).any()
            ):
                raise ValueError(
                    f"state.reference.{name} contains NaN — the default "
                    "planning cost tracks references, which vmap_reset does "
                    "not draw; populate them first (e.g. "
                    "utils.episodes.reset_with_references, GymWrapper.reset"
                    "(rng_ref=...), or set them explicitly) or pass cost_fn"
                )


def _rollout(env, state, actions):
    """Open-loop rollout of a normalized action sequence via ``vmap_step``.

    ``actions``: ``(batch, horizon, action_dim)``.  Returns
    ``(obs, rewards)`` batch-major — ``(batch, horizon, obs_dim)`` /
    ``(batch, horizon)`` — and the final state.  The step semantics are the
    shared Gym-contract implementation (``episodes.step_with_flags``; the
    unused flags are dead-code-eliminated under jit).
    """

    def step_fn(s, a):
        obs, s, reward, _, _, _ = episodes.step_with_flags(env, s, a)
        return s, (obs, reward)

    last, (obs, rew) = jax.lax.scan(step_fn, state, jnp.swapaxes(actions, 0, 1))
    return jnp.swapaxes(obs, 0, 1), jnp.swapaxes(rew, 0, 1), last


def _trajectory_cost(env, state, actions, cost_fn):
    """Total planning cost of one candidate plan per instance, ``(batch,)``."""
    obs, rew, _ = _rollout(env, state, actions)
    if cost_fn is None:
        return -jnp.sum(rew, axis=1)
    return cost_fn(obs, actions)


# ---------------------------------------------------------------------------
# fused planning backend: candidate rollouts through the Pallas kernels
# ---------------------------------------------------------------------------


def _tile_env(env, k):
    """Shadow env with ``batch_size = k * B`` — the MPPI sample axis folded
    into the batch axis so the fused kernels see one big rollout.  Per-batch
    heterogeneous property leaves are tiled alongside; cached jitted kernel
    impls inherited from the wrapped env are dropped (they bake the original
    batch size into the compiled program, mirroring
    ``parallel/mesh.py::_local_shadow``)."""
    B = env.batch_size
    # key on (k, B): a shadow cached on a global-batch env must not leak
    # into the per-shard local shadow (which copies __dict__), and vice versa
    cached = env.__dict__.get("_mppi_tiled_shadow")
    if cached is not None and cached[0] == (k, B):
        return cached[1]

    def tile(leaf):
        if np.ndim(leaf) > 0 and np.shape(leaf)[0] == B:
            leaf = jnp.asarray(leaf)
            return jnp.tile(leaf, (k,) + (1,) * (leaf.ndim - 1))
        return leaf

    shadow = object.__new__(type(env))
    shadow.__dict__.update(env.__dict__)
    shadow.batch_size = k * B
    shadow.env_properties = jax.tree_util.tree_map(tile, env.env_properties)
    for key in (
        "_pmsm_fused_impl", "_pmsm_fused_sim_ahead_impl",
        "_pmsm_cl_impl", "_fused_tile_ode", "_mppi_tiled_shadow",
    ):
        shadow.__dict__.pop(key, None)
    env.__dict__["_mppi_tiled_shadow"] = ((k, B), shadow)
    return shadow


def planning_path(env, config: MPPIConfig = MPPIConfig(), interpret: bool = False) -> str:
    """Which backend evaluates MPPI candidate rollouts for ``env``:
    ``"pmsm_fused"`` / ``"fused"`` (Pallas kernels over the folded
    ``n_samples x batch`` axis) or ``"scan"`` (the XLA ``lax.scan`` of
    ``vmap_step``).  Mirrors
    :func:`exciting_environments_tpu.ops.pallas.rollout_path` semantics
    including the CPU-backend guard."""
    from exciting_environments_tpu.ops.pallas import rollout_path
    from exciting_environments_tpu.parallel.mesh import ShardedEnv

    if isinstance(env, ShardedEnv):
        # the fused planning sweep folds n_samples into the batch of a TILED
        # shadow env; per-batch (B,) property leaves would need tiling to
        # (K*B,) AND per-shard slicing — neither is routed through the MPPI
        # composition (plain sharded rollouts handle per-shard property
        # operands since round 4, but the candidate sweep does not), so
        # heterogeneous fleets plan through the sharded scan path
        if any(
            np.ndim(leaf) > 0
            for leaf in jax.tree_util.tree_leaves(env.env.env_properties)
        ):
            return "scan"
        # the scope question is then asked of the per-shard shadow
        # (local batch = B / mesh.size)
        env = env._local_shadow()
    if not interpret and jax.default_backend() == "cpu":
        return "scan"
    return rollout_path(_tile_env(env, config.n_samples))


def _fused_trajectory_cost(env, state, cand, cost_fn, interpret):
    """Candidate costs via the fused kernels: ``cand`` is ``(K, B, H, A)``
    normalized; the sample axis folds into the batch axis of a tiled shadow
    env and the whole sweep runs as ONE kernel rollout.  Returns ``(K, B)``."""
    from exciting_environments_tpu.models.pmsm.pmsm_env import PMSM
    from exciting_environments_tpu.ops.pallas.pmsm_stepper import pmsm_fused_rollout
    from exciting_environments_tpu.ops.pallas.stepper import env_fused_rollout

    K, B, H, A = cand.shape
    big = _tile_env(env, K)
    state_big = jax.tree_util.tree_map(
        lambda x: jnp.tile(jnp.asarray(x), (K,) + (1,) * (jnp.asarray(x).ndim - 1)),
        state,
    )
    cand_flat = cand.reshape(K * B, H, A)
    if isinstance(env, PMSM):
        obs, traj_state, _ = pmsm_fused_rollout(
            big, state_big, cand_flat, obs_stride=1,
            gather="take" if interpret else "int8", interpret=interpret,
            return_traj_states=True,
        )
    else:
        obs, traj_state, _ = env_fused_rollout(
            big, state_big, cand_flat, obs_stride=1, interpret=interpret,
            return_traj_states=True,
        )
    if cost_fn is None:
        reward = jax.vmap(
            jax.vmap(env.generate_reward, in_axes=(0, 0, None)),
            in_axes=(0, 0, big.in_axes_env_properties),
        )(traj_state, cand_flat, big.env_properties)
        return -jnp.sum(reward.reshape(K * B, -1), axis=1).reshape(K, B)
    # identical cost_fn contract on both backends: one (batch, horizon, ...)
    # call per candidate, so batch-shaped closures / cross-batch reductions
    # behave the same whichever backend auto-selection picks
    obs_k = obs.reshape((K, B) + obs.shape[1:])
    return jax.vmap(cost_fn)(obs_k, cand)


def _resolve_fused(env, config, fused, interpret):
    """Trace-time backend selection for :func:`mppi_plan` / :func:`run_mppi`.

    Auto mode (``fused=None``) picks the fused backend only for the PMSM
    drive kernel: measured on a TPU v5 chip the drive sweep is ~17x the
    scan backend (3.2e8 vs 1.9e7 candidate-env-steps/s, chain scaling
    verified, ``benchmarks/r03/mpc_fused_device.py``) because each step
    carries LUT gathers, while for cheap classic ODEs XLA's fused scan is already the
    faster planner (pendulum: 7.8e9 scan vs 2.7e9 through the generic
    kernel, whose stride-1 trajectory write is the bottleneck).  Explicit
    ``fused=True`` forces the kernel backend either way."""
    if fused is False:
        return False
    path = planning_path(env, config, interpret)
    if path == "scan":
        if fused:
            raise ValueError(
                "fused=True but the fused kernels do not cover this planning "
                f"configuration (planning_path() == 'scan': CPU backend "
                "without interpret, batch tiling, per-batch params, state "
                "layout, or solver family)"
            )
        return False
    return True if fused else path == "pmsm_fused"


def _smooth_noise(eps, beta):
    """Exponentially smooth noise along the horizon axis (axis=-2), keeping
    the marginal variance: ``e_t = beta e_{t-1} + sqrt(1-beta^2) n_t``."""
    if beta == 0.0:
        return eps
    scale = jnp.sqrt(1.0 - beta**2).astype(eps.dtype)

    def f(prev, n):
        e = beta * prev + scale * n
        return e, e

    eps_t = jnp.moveaxis(eps, -2, 0)
    _, sm = jax.lax.scan(f, eps_t[0], eps_t[1:])
    return jnp.moveaxis(jnp.concatenate([eps_t[:1], sm], axis=0), 0, -2)


def mppi_plan(
    env,
    state,
    plan,
    key,
    config: MPPIConfig = MPPIConfig(),
    cost_fn=None,
    fused: bool = None,
    interpret: bool = False,
):
    """One MPPI update of the mean plan (jit-compatible, differentiable-free).

    Args:
        env: a batched :class:`CoreEnvironment`, or a mesh-sharded
            ``ShardedEnv`` — the scan backend then rides GSPMD (bit-identical
            to the single-device run), while the fused backend runs the
            kernel per shard inside ``shard_map`` with per-shard
            decorrelated noise (``fold_in(key, axis_index)``), so its draws
            intentionally differ from the single-device draws.
        state: batched state to plan from.
        plan: current mean plan, normalized,
            ``(batch_size, horizon, action_dim)``.
        key: PRNG key.
        config: :class:`MPPIConfig` (``config.horizon`` must equal
            ``plan.shape[1]``).
        cost_fn: optional ``cost_fn(obs, actions) -> (batch_size,)`` total
            trajectory cost; default = minus the summed env rewards.
        fused: candidate-rollout backend — ``None`` (auto: the PMSM drive
            kernel when :func:`planning_path` says ``"pmsm_fused"`` —
            measured ~17x the scan sweep — and the scan otherwise, which
            is the faster planner for cheap classic ODEs), ``True``
            (require the kernels, raise when out of scope), ``False``
            (always the ``lax.scan`` of ``vmap_step``).  Both backends see
            identical candidate draws; on TPU hardware the kernels are
            numerically identical to the scan.
        interpret: run the kernels in Pallas interpret mode (CPU testing).

    Returns:
        The updated mean plan, same shape, clipped to [-1, 1].
    """
    use_fused = _resolve_fused(env, config, fused, interpret)
    if _is_sharded(env) and use_fused:
        _validate_plan(env.env, config, plan, cost_fn, state)
        return _shard_mapped(env, _plan_core, config, cost_fn, interpret)(
            env.shard(state), env.shard(plan), key
        )
    env, place = unwrap_sharded(env)
    state, plan = place(state), place(plan)
    _validate_plan(env, config, plan, cost_fn, state)
    return _plan_core(env, state, plan, key, config, cost_fn, use_fused, interpret)


def _is_sharded(env):
    from exciting_environments_tpu.parallel.mesh import ShardedEnv

    return isinstance(env, ShardedEnv)


def _validate_plan(env, config, plan, cost_fn, state):
    _check_cost_setup(env, cost_fn, state)
    B, H, A = env.batch_size, config.horizon, env.action_dim
    if plan.shape != (B, H, A):
        raise ValueError(
            f"plan must have shape (batch_size, horizon, action_dim) = "
            f"{(B, H, A)}, but {plan.shape} is given"
        )


def _shard_mapped(senv, core_fn, config, cost_fn, interpret, extra_static=()):
    """Wrap a ``core_fn(local_env, state, plan, key, config, cost_fn, True,
    interpret, *extra_static)`` in ``shard_map`` over the facade's mesh: the
    fused kernels run per shard on the local shadow env (planning is
    per-instance independent — zero communication).  The replicated key is
    decorrelated per shard by folding in the mesh axis index, so sharded
    noise draws differ from the single-device draws by construction."""
    from jax.sharding import PartitionSpec as P

    local = senv._local_shadow()
    spec = P(senv.axis_name)

    def local_fn(state_l, plan_l, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(senv.axis_name))
        return core_fn(local, state_l, plan_l, key, config, cost_fn, True,
                       interpret, *extra_static)

    return jax.shard_map(
        local_fn, mesh=senv.mesh, in_specs=(spec, spec, P()), out_specs=spec,
        check_vma=False,
    )


def _plan_core(env, state, plan, key, config, cost_fn, use_fused, interpret):
    """The MPPI update body on a concrete (non-facade) env; jit/shard_map
    compatible, no validation."""
    B, H, A = env.batch_size, config.horizon, env.action_dim
    sigma = jnp.broadcast_to(jnp.asarray(config.noise_sigma, plan.dtype), (A,))

    def one_iteration(plan, key):
        eps = jax.random.normal(key, (config.n_samples, B, H, A), plan.dtype)
        eps = _smooth_noise(eps, config.smoothing) * sigma
        cand = jnp.clip(plan[None] + eps, -1.0, 1.0)
        if use_fused:
            costs = _fused_trajectory_cost(env, state, cand, cost_fn, interpret)
        else:
            costs = jax.vmap(lambda a: _trajectory_cost(env, state, a, cost_fn))(cand)
        w = jax.nn.softmax(-costs / config.temperature, axis=0)  # (K, B)
        return jnp.einsum("kb,kbha->bha", w, cand), None

    plan, _ = jax.lax.scan(
        one_iteration, plan, jax.random.split(key, config.n_iterations)
    )
    return plan


def run_mppi(
    env,
    state,
    n_steps: int,
    key=None,
    config: MPPIConfig = MPPIConfig(),
    cost_fn: Callable = None,
    plan=None,
    fused: bool = None,
    interpret: bool = False,
) -> MPCResult:
    """Receding-horizon MPPI control loop as ONE jitted XLA program.

    Each of the ``n_steps`` control steps re-plans with
    :func:`mppi_plan` (``n_samples * batch_size * horizon`` candidate env
    steps), applies the plan's first action through ``env.vmap_step``, and
    warm-starts the next step by shifting the plan one slot (repeating the
    final entry).  The host sees a single device dispatch.

    Args:
        env: a batched :class:`CoreEnvironment`, or a mesh-sharded
            ``ShardedEnv`` — planning is embarrassingly parallel across
            instances, so the whole loop then runs zero-communication SPMD
            over the mesh (with the fused backend, the entire receding
            horizon — plan, step, shift — executes per shard inside
            ``shard_map`` with per-shard decorrelated noise).
        state: batched initial state.  With the default (tracking-reward)
            cost its references must be populated —
            :func:`~exciting_environments_tpu.utils.episodes.reset_with_references`
            draws them; a bare ``vmap_reset`` leaves them NaN (rejected with
            a ``ValueError`` here rather than returning NaN plans).
        n_steps: control steps to run.
        key: PRNG key (default ``PRNGKey(0)``).
        config: :class:`MPPIConfig`.
        cost_fn: optional trajectory cost, see :func:`mppi_plan`.
        plan: optional warm-start plan (default zeros).
        fused: candidate-rollout backend selection, see :func:`mppi_plan`.
        interpret: run the kernels in Pallas interpret mode (CPU testing).

    Returns:
        :class:`MPCResult`.
    """
    use_fused = _resolve_fused(env, config, fused, interpret)
    sharded_fused = _is_sharded(env) and use_fused
    core_env, place = unwrap_sharded(env)
    if key is None:
        key = jax.random.PRNGKey(0)
    B, H, A = core_env.batch_size, config.horizon, core_env.action_dim
    dtype = jnp.result_type(float)
    if plan is None:
        plan = jnp.zeros((B, H, A), dtype)
    _validate_plan(core_env, config, plan, cost_fn, state)
    state, plan = place(state), place(plan)

    if sharded_fused:
        # the whole receding-horizon loop is per-instance independent, so it
        # runs entirely inside shard_map: per-shard fused kernels, zero
        # communication across the mesh
        run = jax.jit(_shard_mapped(env, _control_core, config, cost_fn,
                                    interpret, extra_static=(n_steps,)))
    else:
        @jax.jit
        def run(state, plan, key):
            return _control_core(core_env, state, plan, key, config, cost_fn,
                                 use_fused, interpret, n_steps)

    obs, act, rew, state, plan = run(state, plan, key)
    return MPCResult(
        observations=obs, actions=act, rewards=rew, final_state=state, plan=plan
    )


def _control_core(env, state, plan, key, config, cost_fn, use_fused, interpret,
                  n_steps):
    """The receding-horizon loop body on a concrete env: plan, apply the
    first action, shift; one ``lax.scan`` over control steps.  Returns
    batch-major ``(obs, actions, rewards, final_state, plan)``."""

    def step_fn(carry, k):
        state, plan = carry
        plan = _plan_core(env, state, plan, k, config, cost_fn, use_fused,
                          interpret)
        action = plan[:, 0]
        obs, state, reward, _, _, _ = episodes.step_with_flags(env, state, action)
        plan = jnp.concatenate([plan[:, 1:], plan[:, -1:]], axis=1)
        return (state, plan), (obs, action, reward)

    (state, plan), (obs, act, rew) = jax.lax.scan(
        step_fn, (state, plan), jax.random.split(key, n_steps)
    )
    return (
        jnp.swapaxes(obs, 0, 1),
        jnp.swapaxes(act, 0, 1),
        jnp.swapaxes(rew, 0, 1),
        state,
        plan,
    )


def optimize_actions(
    env,
    state,
    actions,
    iterations: int,
    learning_rate: float = 0.1,
    optimizer=None,
    cost_fn: Callable = None,
) -> PlanResult:
    """Gradient-based open-loop trajectory optimization.

    Backpropagates the planning cost through the rollout (a ``lax.scan``
    of ``vmap_step`` — differentiable end-to-end) into a
    ``tanh``-parameterized action sequence, so every iterate stays inside
    the normalized [-1, 1] band.  All ``iterations`` optimizer steps run
    inside one jitted ``lax.scan``.

    Args:
        env: a batched :class:`CoreEnvironment`.
        state: batched state to plan from.
        actions: initial normalized plan ``(batch_size, horizon, action_dim)``
            (entries strictly inside (-1, 1) are recovered exactly by the
            ``tanh`` warm start; ±1 saturates).
        iterations: optimizer steps.
        learning_rate: adam learning rate (ignored when ``optimizer`` given).
        optimizer: optional optax optimizer.
        cost_fn: optional trajectory cost, see :func:`mppi_plan`.

    Returns:
        :class:`PlanResult`.
    """
    import optax

    env, place = unwrap_sharded(env)
    state, actions = place(state), place(actions)
    _check_cost_setup(env, cost_fn, state)
    B, A = env.batch_size, env.action_dim
    if actions.ndim != 3 or actions.shape[0] != B or actions.shape[2] != A:
        raise ValueError(
            f"actions must have shape (batch_size, horizon, action_dim) = "
            f"({B}, horizon, {A}), but {actions.shape} is given"
        )
    if optimizer is None:
        optimizer = optax.adam(learning_rate)

    def mean_cost(z):
        return jnp.mean(_trajectory_cost(env, state, jnp.tanh(z), cost_fn))

    @jax.jit
    def solve(z):
        opt_state = optimizer.init(z)

        def opt_step(carry, _):
            z, opt_state = carry
            cost, grads = jax.value_and_grad(mean_cost)(z)
            updates, opt_state = optimizer.update(grads, opt_state, z)
            return (optax.apply_updates(z, updates), opt_state), cost

        # costs[i] is the cost *before* step i (entry 0 = initial plan);
        # append the final iterate's cost for a (iterations + 1,) curve
        (z, _), costs = jax.lax.scan(opt_step, (z, opt_state), length=iterations)
        return z, jnp.concatenate([costs, mean_cost(z)[None]])

    z0 = jnp.arctanh(jnp.clip(actions, -1.0 + 1e-6, 1.0 - 1e-6))
    z, costs = solve(z0)
    return PlanResult(actions=jnp.tanh(z), costs=costs)
