"""Gradient-based controller training through the closed-loop kernels.

The closed-loop Pallas kernels are differentiable w.r.t. an SMEM-streamed
policy parameter pytree (checkpointed-recompute ``custom_vjp``), which turns
controller tuning into plain gradient descent with the simulation forward
pass at kernel speed — a capability the reference's per-step Python loop
(``gym_wrapper.py:88-130``) cannot express.  This module packages the loop:
pick the right kernel (generic / PMSM drive / sharded), jit one optax
value-and-grad step, iterate.

No reference counterpart (the reference exposes no training utilities).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class TrainResult(NamedTuple):
    """Outcome of :func:`train_policy`.

    ``params``: the trained parameter pytree.  ``losses``: per-iteration
    loss values, shape ``(iterations,)`` (host array).  ``final_loss``:
    loss of the returned params on a fresh rollout.
    """

    params: object
    losses: jnp.ndarray
    final_loss: float


def default_tracking_loss(env):
    """Mean squared normalized tracking error over the rollout.

    Pairs each tracked ``control_state`` component with its reference
    column in the observation layout (physical/ode fields first, references
    appended in ``control_state`` order — both the generic and the PMSM
    closed-loop kernels follow ``generate_observation``'s column order).
    """
    names = list(env.obs_description)
    pairs = []
    for i, name in enumerate(env.control_state):
        ref_col = len(names) - len(env.control_state) + i
        if name not in names:
            raise ValueError(
                f"control_state component {name!r} not found in "
                f"obs_description {names}; pass an explicit loss_fn"
            )
        pairs.append((names.index(name), ref_col))
    if not pairs:
        raise ValueError(
            "default_tracking_loss needs a non-empty control_state; pass an "
            "explicit loss_fn instead"
        )

    def loss(obs, acts):
        return sum(jnp.mean((obs[:, :, a] - obs[:, :, b]) ** 2) for a, b in pairs)

    return loss


def train_policy(
    env,
    policy,
    params,
    state,
    n_steps: int,
    iterations: int,
    optimizer=None,
    loss_fn: Callable = None,
    interpret: bool = False,
    policy_carry=None,
) -> TrainResult:
    """Train ``policy(obs, t, params)`` by backprop through the closed loop.

    Stochastic classic envs train at kernel speed too: the closed-loop
    kernel streams the env's sensor/process draw slabs, so the descent
    tunes a NOISE-ROBUST output-feedback law.  Draws derive from
    ``state.PRNGKey`` and ``state`` is fixed across iterations, so every
    iteration sees the same disturbance realizations (common random
    numbers — deliberately low-variance gradients; resample the state's
    keys between calls to vary the scenario set).

    Args:
        env: a :class:`CoreEnvironment` (or PMSM / ``ShardedEnv``) inside
            closed-loop kernel scope.
        policy: tile policy taking ``(obs_tuple, step, params)`` and
            returning the normalized action component tuple — or, with
            ``policy_carry``, a STATEFUL ``(obs_tuple, step, carry, params)
            -> (action_tuple, carry)`` law whose per-instance state (PI
            integrators, filters) rides VMEM planes between steps; gradients
            flow through the carry into the parameters, so PI/PID gains
            tune by the same descent loop.
        params: initial parameter pytree (gains, small MLP weights, ...).
        state: batched initial state (references set where tracked).
        n_steps: rollout length per training iteration.
        iterations: optimizer steps.
        optimizer: an optax gradient transformation; defaults to
            ``optax.adam(0.1)`` (plain gradient descent diverges on stiff
            drive landscapes — see ``benchmarks/r03/pmsm_policy_grad_device``).
        loss_fn: ``loss(obs_traj, acts_traj) -> scalar`` over the
            ``(B, n_steps, obs_dim)`` observation and ``(B, n_steps, A)``
            normalized-action trajectories; defaults to
            :func:`default_tracking_loss`.
        interpret: run the kernels in interpreter mode (CPU testing).
        policy_carry: optional tuple of ``(B,)`` float leaves — the
            stateful policy's initial carry, reset to this value at the
            start of every training rollout.

    Returns:
        :class:`TrainResult`.  Raises when ``env`` is out of closed-loop
        kernel scope (no scan fallback: training wants the kernel-speed
        forward pass; use ``jax.grad`` over ``RolloutCollector.collect_policy``
        manually for out-of-scope environments).
    """
    import optax

    from exciting_environments_tpu.ops.pallas import select_closed_loop
    from exciting_environments_tpu.parallel.mesh import ShardedEnv

    if optimizer is None:
        optimizer = optax.adam(0.1)
    if loss_fn is None:
        loss_fn = default_tracking_loss(env)

    # same CPU-backend guard as FleetRunner/RolloutCollector: without
    # interpret, the closed-loop kernels are Mosaic programs that cannot
    # lower on a CPU (virtual-device) backend — fail with the module's
    # descriptive error instead of a cryptic compiler crash
    if not interpret and jax.default_backend() == "cpu":
        raise ValueError(
            "train_policy on the CPU backend requires interpret=True "
            "(Mosaic closed-loop kernels cannot lower on CPU)"
        )

    if isinstance(env, ShardedEnv):
        if not env.closed_loop_in_scope(interpret):
            raise ValueError(
                "train_policy requires closed-loop kernel scope for this "
                "sharded env (kernel scope, scalar normalizations, "
                "deterministic env, or per-shard batch tiling)"
            )

        def rollout(p):
            return env.fused_closed_loop(
                state, policy, n_steps, obs_stride=1, interpret=interpret,
                policy_params=p, policy_carry=policy_carry,
            )
    else:
        kernel, extra = select_closed_loop(env, interpret)
        if kernel is None:
            raise ValueError(
                "train_policy requires closed-loop kernel scope "
                "(batch multiple of 1024, scalar normalizations, explicit RK "
                "solver; the PMSM drive kernel additionally takes no "
                "process/observation noise — classic stochastic envs ARE in "
                "scope via the streamed draw slabs; for out-of-scope "
                "configurations train through train_ppo/train_sac or plan "
                "with run_mppi instead)"
            )

        def rollout(p):
            return kernel(
                env, state, policy, n_steps, obs_stride=1, interpret=interpret,
                policy_params=p, policy_carry=policy_carry, **extra,
            )

    def loss(p):
        out = rollout(p)
        obs, acts = out[0], out[1]
        return loss_fn(obs, acts)

    vg = jax.value_and_grad(loss)
    loss_only = jax.jit(loss)
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(p, opt_state):
        value, grads = vg(p)
        updates, opt_state = optimizer.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, value

    losses = []
    best = (None, float("inf"))
    for _ in range(iterations):
        # `value` is the loss at the PRE-update `params` of this step; keep
        # the best iterate seen (drive landscapes oscillate under adam)
        new_params, opt_state, value = train_step(params, opt_state)
        v = float(value)
        losses.append(v)
        if v < best[1]:
            best = (params, v)
        params = new_params
    final_loss = float(loss_only(params))
    if best[1] < final_loss and best[0] is not None:
        params, final_loss = best
    return TrainResult(params=params, losses=jnp.asarray(losses), final_loss=float(final_loss))
