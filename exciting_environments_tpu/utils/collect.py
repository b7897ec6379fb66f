"""Fleet-scale trajectory collection for RL / system-identification datasets.

The reference leaves data capture to user-side Python loops; this module
provides the production path: a single jitted ``lax.scan`` that steps the
batched environment, evaluates rewards and termination flags, and stores the
whole trajectory batch on-device — one dispatch per collected dataset, mesh-
shardable over the batch axis like every other rollout.

Two action sources:

* **open-loop**: a precomputed action slab ``(B, T, A)`` (e.g. from
  :mod:`exciting_environments_tpu.ops.signals`),
* **closed-loop**: a jittable ``policy(obs, key) -> action`` evaluated
  per step on-device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from exciting_environments_tpu.core.structures import pytree_dataclass


def tile_policy_scan(env, state, n_steps, policy_tile, policy_params,
                     collect_trajectory: bool, policy_carry=None,
                     sched_lut=None):
    """Closed loop over a tile-contract policy as a ``lax.scan`` — the CPU /
    out-of-kernel-scope fallback shared by :class:`RolloutCollector` and
    ``FleetRunner``.

    The policy keeps the in-kernel contract (``policy(obs_tuple, step[,
    params]) -> action component tuple`` with ``obs_tuple`` indexable per
    observation column), evaluated here on ``(B,)`` columns; with
    ``policy_carry`` the stateful contract ``policy(obs, step, carry[,
    params]) -> (action, carry)``.  Returns ``(final_obs, final_state)``,
    or with ``collect_trajectory`` the batch-major ``(obs, actions,
    traj_states, final_state)`` — each gaining the final carry as its last
    element when ``policy_carry`` is given.

    Stochastic envs consume the whole-rollout draw stream
    (``CoreEnvironment._noise_slabs``, the same slabs the fused closed-loop
    kernel streams, in BOTH noise modes) — the policy closes the loop over
    the noisy measurements and the fused path stays draw-identical; in
    ``"exact"`` mode this also equals chaining ``env.step`` by hand.  The
    first observation is the exact reset observation (no sensor draw has
    been consumed yet).

    ``sched_lut`` (a :class:`...ops.pallas.pmsm_stepper.ScheduledLUT`)
    mirrors the kernel's scheduled-observer gather: its channels are
    gathered at the denormalized belief currents held in the designated
    policy-carry planes and appended to the observation tuple the policy
    sees — the gain-scheduled sensorless tile runs draw-identically here
    and in-kernel.
    """
    from exciting_environments_tpu.core import structures

    in_ax = env.in_axes_env_properties
    props = env.env_properties
    obs0 = jax.vmap(env.generate_observation, in_axes=(0, in_ax))(state, props)
    has_carry = policy_carry is not None
    if sched_lut is not None:
        if not has_carry:
            raise ValueError("sched_lut requires a stateful policy (policy_carry)")
        from exciting_environments_tpu.ops.lut import bilinear_gather

        lut = env._lut
        pn_ = props.physical_normalizations
        _sp = lambda n: (jnp.asarray(getattr(pn_, n).min), jnp.asarray(getattr(pn_, n).max))
        (smn0, smx0), (smn1, smx1) = _sp("i_d"), _sp("i_q")
        sched_vals = jnp.asarray(sched_lut.values, obs0.dtype)
        sc0, sc1 = sched_lut.carry_idx
        n_sched = sched_lut.values.shape[0]

        def _sched_cols(pc):
            bi_d = (pc[sc0] + 1) / 2 * (smx0 - smn0) + smn0
            bi_q = (pc[sc1] + 1) / 2 * (smx1 - smn1) + smn1
            vals = bilinear_gather(
                sched_vals, lut.x0, lut.dx, lut.y0, lut.dy, lut.nx, lut.ny,
                bi_d, bi_q,
            )
            return tuple(vals[c] for c in range(n_sched))
    else:
        _sched_cols = None
    has_noise = getattr(env, "_has_noise", False)

    if has_noise:
        keys0 = env._require_noise_key(state)
        eps_proc, eps_obs, keys_saves, _final_keys = env._noise_slabs(keys0, n_steps, 1)
        B = env.batch_size
        ep_tm = (
            jnp.swapaxes(eps_proc, 0, 1) if eps_proc is not None
            else jnp.zeros((n_steps, B, 0))
        )
        eo_tm = (
            jnp.swapaxes(eps_obs, 0, 1) if eps_obs is not None
            else jnp.zeros((n_steps, B, 0))
        )
        keys_tm = jnp.moveaxis(keys_saves, 1, 0)

        def step1(s, a, p, ep, eo):
            s = env._fast_noise_advance_eps(s, a, p, ep)
            return env._fast_noise_observe_eps(s, p, eo), s

        step_noisy = jax.vmap(step1, in_axes=(0, 0, in_ax, 0, 0))
    else:
        step_b = jax.vmap(env.step, in_axes=(0, 0, in_ax))

    def body(carry, xs):
        st, obs, pc = carry
        t = xs[0] if has_noise else xs
        cols = tuple(obs[:, i] for i in range(obs.shape[1]))
        if _sched_cols is not None:
            cols = cols + _sched_cols(pc)
        if has_carry:
            args = (cols, t, pc) + ((policy_params,) if policy_params is not None else ())
            a, pc = policy_tile(*args)
            pc = tuple(pc)
        else:
            a = (
                policy_tile(cols, t, policy_params)
                if policy_params is not None
                else policy_tile(cols, t)
            )
        action = jnp.stack(a, axis=-1)
        if has_noise:
            _t, ep_t, eo_t, key_t = xs
            obs, st = step_noisy(st, action, props, ep_t, eo_t)
            # each step's state carries ITS advanced key (resume parity with
            # env.step's chain / the kernel's keys_saves)
            st = structures.replace(st, PRNGKey=key_t)
        else:
            obs, st = step_b(st, action, props)
        return (st, obs, pc), ((obs, action, st) if collect_trajectory else None)

    pc0 = tuple(policy_carry) if has_carry else ()
    xs = (
        (jnp.arange(n_steps), ep_tm, eo_tm, keys_tm)
        if has_noise
        else jnp.arange(n_steps)
    )
    (final_state, final_obs, final_pc), ys = jax.lax.scan(
        body, (state, obs0, pc0), xs
    )
    if not collect_trajectory:
        if has_carry:
            return final_obs, final_state, final_pc
        return final_obs, final_state
    obs, action, traj_state = ys
    batch_major = lambda x: jnp.swapaxes(x, 0, 1)
    traj_state = jax.tree_util.tree_map(batch_major, traj_state)
    if has_carry:
        return batch_major(obs), batch_major(action), traj_state, final_state, final_pc
    return batch_major(obs), batch_major(action), traj_state, final_state


@pytree_dataclass
class TrajectoryBatch:
    """On-device trajectory storage, batch-major: every leaf ``(B, T, ...)``."""

    observations: jax.Array
    actions: jax.Array
    rewards: jax.Array
    terminated: jax.Array
    truncated: jax.Array


class RolloutCollector:
    """Collects trajectory batches from a batched environment."""

    def __init__(self, env):
        self.env = env

    @partial(jax.jit, static_argnums=0)
    def collect(self, state, actions):
        """Open-loop collection.

        Args:
            state: batched state (from ``vmap_reset``).
            actions: normalized actions, shape ``(B, T, A)``.

        Returns:
            ``(TrajectoryBatch, final_state)`` with observations/rewards/flags
            for each of the ``T`` steps (observations are post-step).
        """
        env = self.env
        if (
            getattr(env, "_has_noise", False)
            and getattr(env, "_noise_mode", "exact") == "fast"
            and hasattr(env, "_noise_slabs")
        ):
            # fast-mode draw streams are defined per ROLLOUT (time-parallel
            # slabs from the starting key) — consume the same slab the fused
            # collector's kernel does, so collect == collect_fused holds in
            # fast mode exactly as it does in exact mode
            return self._collect_fast_noise(state, actions)
        in_axes = env.in_axes_env_properties
        step_batch = jax.vmap(env.step, in_axes=(0, 0, in_axes))
        reward_batch = jax.vmap(env.generate_reward, in_axes=(0, 0, in_axes))
        term_batch = jax.vmap(env.generate_terminated, in_axes=(0, 0, in_axes))
        trunc_batch = jax.vmap(env.generate_truncated, in_axes=(0, in_axes))

        def body(state, action_t):
            obs, state = step_batch(state, action_t, env.env_properties)
            reward = reward_batch(state, action_t, env.env_properties)
            terminated = term_batch(state, reward, env.env_properties)
            truncated = trunc_batch(state, env.env_properties)
            return state, (obs, reward, terminated, truncated)

        final_state, (obs, reward, terminated, truncated) = jax.lax.scan(
            body, state, jnp.swapaxes(actions, 0, 1)
        )
        batch_major = lambda x: jnp.swapaxes(x, 0, 1)
        return (
            TrajectoryBatch(
                observations=batch_major(obs),
                actions=actions,
                rewards=batch_major(reward),
                terminated=batch_major(terminated),
                truncated=batch_major(truncated),
            ),
            final_state,
        )

    @partial(jax.jit, static_argnums=0)
    def _collect_fast_noise(self, state, actions):
        """:meth:`collect` body for ``noise_mode="fast"`` stochastic envs:
        the whole rollout's draws generate time-parallel upfront
        (``CoreEnvironment._noise_slabs``) and the scan consumes slab rows —
        the same stream the fused kernel streams, so the produced
        :class:`TrajectoryBatch` is path-independent."""
        from exciting_environments_tpu.core import structures

        env = self.env
        n_steps = actions.shape[1]
        keys0 = env._require_noise_key(state)
        eps_proc, eps_obs, _, final_keys = env._noise_slabs(keys0, n_steps, 1)
        in_axes = env.in_axes_env_properties
        props = env.env_properties
        has_proc = eps_proc is not None
        has_obs = eps_obs is not None

        def step1(s, a, p, ep, eo):
            # the same slab-consuming composition as the fast-mode rollout
            # scan — single-sourced on CoreEnvironment so the two paths stay
            # draw-identical
            s = env._fast_noise_advance_eps(s, a, p, ep)
            return env._fast_noise_observe_eps(s, p, eo), s

        step_batch = jax.vmap(step1, in_axes=(0, 0, in_axes, 0, 0))
        reward_batch = jax.vmap(env.generate_reward, in_axes=(0, 0, in_axes))
        term_batch = jax.vmap(env.generate_terminated, in_axes=(0, 0, in_axes))
        trunc_batch = jax.vmap(env.generate_truncated, in_axes=(0, in_axes))

        ep_tm = (
            jnp.swapaxes(eps_proc, 0, 1)
            if has_proc
            else jnp.zeros((n_steps, env.batch_size, 0))
        )
        eo_tm = (
            jnp.swapaxes(eps_obs, 0, 1)
            if has_obs
            else jnp.zeros((n_steps, env.batch_size, 0))
        )

        def body(state, xs):
            action_t, ep_t, eo_t = xs
            obs, state = step_batch(state, action_t, props, ep_t, eo_t)
            reward = reward_batch(state, action_t, props)
            terminated = term_batch(state, reward, props)
            truncated = trunc_batch(state, props)
            return state, (obs, reward, terminated, truncated)

        final_state, (obs, reward, terminated, truncated) = jax.lax.scan(
            body, state, (jnp.swapaxes(actions, 0, 1), ep_tm, eo_tm)
        )
        final_state = structures.replace(final_state, PRNGKey=final_keys)
        batch_major = lambda x: jnp.swapaxes(x, 0, 1)
        return (
            TrajectoryBatch(
                observations=batch_major(obs),
                actions=actions,
                rewards=batch_major(reward),
                terminated=batch_major(terminated),
                truncated=batch_major(truncated),
            ),
            final_state,
        )

    def collect_fused(self, state, actions, interpret: bool = False):
        """Open-loop collection at fused-kernel speed.

        Identical contract to :meth:`collect` — the per-step states come out
        of the Pallas kernel's trajectory stream instead of a ``lax.scan``,
        and rewards/flags are evaluated on the reconstructed states inside
        the same jitted program (reference semantics bar:
        ``gym_wrapper.py:88-130`` — reward on the post-step state under the
        taken action).  Out-of-scope environments transparently ride
        :meth:`collect`; probe with
        :func:`exciting_environments_tpu.ops.pallas.rollout_path`.
        """
        from exciting_environments_tpu.ops.pallas import rollout_path

        # same CPU-backend guard as FleetRunner._select_rollout: compiled
        # Mosaic kernels only exist on TPU, so without interpret mode the
        # scan path is the real implementation there
        on_cpu = not interpret and jax.default_backend() == "cpu"
        if on_cpu or rollout_path(self.env) == "scan":
            return self.collect(state, actions)
        return self._collect_fused_impl(state, actions, interpret)

    @partial(jax.jit, static_argnums=(0, 3))
    def _collect_fused_impl(self, state, actions, interpret):
        from exciting_environments_tpu.models.pmsm.pmsm_env import PMSM
        from exciting_environments_tpu.ops.pallas.pmsm_stepper import pmsm_fused_rollout
        from exciting_environments_tpu.ops.pallas.stepper import env_fused_rollout
        from exciting_environments_tpu.parallel.mesh import ShardedEnv

        env = self.env
        if isinstance(env, ShardedEnv):
            obs, traj_state, final_state = env.fused_rollout(
                state, actions, obs_stride=1, interpret=interpret,
                return_traj_states=True,
            )
        elif isinstance(env, PMSM):
            obs, traj_state, final_state = pmsm_fused_rollout(
                env, state, actions, obs_stride=1,
                gather="take" if interpret else "int8", interpret=interpret,
                return_traj_states=True,
            )
        else:
            obs, traj_state, final_state = env_fused_rollout(
                env, state, actions, obs_stride=1, interpret=interpret,
                return_traj_states=True,
            )
        return self._assemble_batch(obs, actions, traj_state, final_state)

    def _assemble_batch(self, obs, actions, traj_state, final_state):
        """Rewards/flags on the kernel's reconstructed per-step states, then
        the :class:`TrajectoryBatch` — shared by both fused collectors."""
        env = self.env
        in_axes = env.in_axes_env_properties
        props = env.env_properties
        reward = jax.vmap(
            jax.vmap(env.generate_reward, in_axes=(0, 0, None)),
            in_axes=(0, 0, in_axes),
        )(traj_state, actions, props)
        terminated = jax.vmap(
            jax.vmap(env.generate_terminated, in_axes=(0, 0, None)),
            in_axes=(0, 0, in_axes),
        )(traj_state, reward, props)
        truncated = jax.vmap(
            jax.vmap(env.generate_truncated, in_axes=(0, None)),
            in_axes=(0, in_axes),
        )(traj_state, props)
        return (
            TrajectoryBatch(
                observations=obs,
                actions=actions,
                rewards=reward,
                terminated=terminated,
                truncated=truncated,
            ),
            final_state,
        )

    def collect_policy_fused(self, policy_tile, state, n_steps: int,
                             interpret: bool = False, policy_params=None,
                             policy_carry=None):
        """Closed-loop collection with the policy evaluated INSIDE the fused
        Pallas kernel (see
        :func:`...ops.pallas.stepper.env_fused_closed_loop` for the
        tile-policy contract).  With ``policy_params`` given the policy is
        ``policy(obs, t, params)`` and the whole collection is
        DIFFERENTIABLE w.r.t. the parameter pytree (policy gradients at
        kernel speed); deterministic policies only — for stochastic
        exploration use :meth:`collect_policy`.  Rewards/flags are
        evaluated on the kernel's reconstructed per-step states in the same
        jitted program; the returned ``TrajectoryBatch`` matches
        :meth:`collect_policy`'s contract (post-step observations, the
        policy's normalized actions).  With ``policy_carry`` the policy is
        STATEFUL (``policy(obs, t, carry[, params]) -> (action, carry)`` —
        PI laws, filters; see ``env_fused_closed_loop``) and the return
        gains the final carry: ``(TrajectoryBatch, final_state,
        final_carry)``.  Raises when the environment is out
        of closed-loop kernel scope.  On the CPU backend without
        ``interpret`` the same tile-policy contract rides a ``lax.scan``
        (compiled Mosaic kernels only exist on TPU — same guard as
        :meth:`collect_fused` and ``FleetRunner``).
        """
        pc = None if policy_carry is None else tuple(policy_carry)
        if not interpret and jax.default_backend() == "cpu":
            # ShardedEnv included: its attribute forwarding gives the scan
            # impl everything it needs, and compiled Mosaic kernels cannot
            # lower on a CPU (virtual-device) mesh any more than single-chip
            return self._collect_policy_scan_impl(
                policy_tile, state, n_steps, policy_params, pc
            )
        return self._collect_policy_fused_impl(
            policy_tile, state, n_steps, interpret, policy_params, pc
        )

    @partial(jax.jit, static_argnums=(0, 1, 3))
    def _collect_policy_scan_impl(self, policy_tile, state, n_steps, policy_params,
                                  policy_carry=None):
        """Scan fallback with the fused collector's exact contract: the tile
        policy evaluated over ``(B,)`` observation columns each step."""
        out = tile_policy_scan(
            self.env, state, n_steps, policy_tile, policy_params,
            collect_trajectory=True, policy_carry=policy_carry,
        )
        obs, action, traj_state, final_state = out[:4]
        assembled = self._assemble_batch(obs, action, traj_state, final_state)
        if policy_carry is not None:
            return assembled + (out[4],)
        return assembled

    @partial(jax.jit, static_argnums=(0, 1, 3, 4))
    def _collect_policy_fused_impl(self, policy_tile, state, n_steps, interpret,
                                   policy_params, policy_carry=None):
        from exciting_environments_tpu.ops.pallas import select_closed_loop
        from exciting_environments_tpu.ops.pallas.stepper import env_fused_closed_loop
        from exciting_environments_tpu.parallel.mesh import ShardedEnv

        env = self.env
        if isinstance(env, ShardedEnv):
            out = env.fused_closed_loop(
                state, policy_tile, n_steps, obs_stride=1, interpret=interpret,
                policy_params=policy_params, return_traj_states=True,
                policy_carry=policy_carry,
            )
        else:
            kernel, extra = select_closed_loop(env, interpret)
            if kernel is None:
                # out of kernel scope: let the generic entry point raise its
                # descriptive error (a closed loop has no open-loop fallback)
                kernel = env_fused_closed_loop
            out = kernel(
                env, state, policy_tile, n_steps, obs_stride=1,
                interpret=interpret, return_traj_states=True,
                policy_params=policy_params, policy_carry=policy_carry, **extra,
            )
        obs, actions, traj_state, final_state = out[:4]
        assembled = self._assemble_batch(obs, actions, traj_state, final_state)
        if policy_carry is not None:
            return assembled + (out[4],)
        return assembled

    @partial(jax.jit, static_argnums=(0, 1, 4))
    def collect_policy(self, policy, state, rng, n_steps: int):
        """Closed-loop collection with an on-device policy.

        Args:
            policy: jittable ``policy(obs, key) -> action`` mapping a batched
                observation ``(B, obs_dim)`` to normalized actions ``(B, A)``.
            state: batched state (from ``vmap_reset``).
            rng: PRNG key (split per step).
            n_steps: horizon (static).

        Returns:
            ``(TrajectoryBatch, final_state)``.
        """
        env = self.env
        in_axes = env.in_axes_env_properties
        obs0 = jax.vmap(env.generate_observation, in_axes=(0, in_axes))(
            state, env.env_properties
        )
        step_batch = jax.vmap(env.step, in_axes=(0, 0, in_axes))
        reward_batch = jax.vmap(env.generate_reward, in_axes=(0, 0, in_axes))
        term_batch = jax.vmap(env.generate_terminated, in_axes=(0, 0, in_axes))
        trunc_batch = jax.vmap(env.generate_truncated, in_axes=(0, in_axes))

        def body(carry, key):
            state, obs = carry
            action = policy(obs, key)
            obs, state = step_batch(state, action, env.env_properties)
            reward = reward_batch(state, action, env.env_properties)
            terminated = term_batch(state, reward, env.env_properties)
            truncated = trunc_batch(state, env.env_properties)
            return (state, obs), (obs, action, reward, terminated, truncated)

        keys = jax.random.split(rng, n_steps)
        (final_state, _), (obs, action, reward, terminated, truncated) = jax.lax.scan(
            body, (state, obs0), keys
        )
        batch_major = lambda x: jnp.swapaxes(x, 0, 1)
        return (
            TrajectoryBatch(
                observations=batch_major(obs),
                actions=batch_major(action),
                rewards=batch_major(reward),
                terminated=batch_major(terminated),
                truncated=batch_major(truncated),
            ),
            final_state,
        )
