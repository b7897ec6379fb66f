"""Production fleet loop: chunked fused rollouts with streaming metrics,
dataset sinking, and periodic checkpointing.

The reference stops at single calls (`vmap_step` in a user-side Python loop);
a production excitation/data-generation deployment needs the loop itself:
pick the fastest execution path for the environment, stream the horizon in
chunks so the host stays ahead of the device, fold per-chunk statistics into
O(1)-state accumulators (no per-step host traffic), spill trajectories to
disk through the asynchronous shard writer, and checkpoint the simulation
state so multi-hour sweeps resume after preemption.  This module composes
those subsystems — every one individually tested — into one loop:

* execution: :func:`...pallas.pmsm_stepper.pmsm_fused_rollout` /
  :func:`...pallas.stepper.env_fused_rollout` / ``vmap_rollout`` /
  ``ShardedEnv.fused_rollout`` (mesh), chosen automatically;
* metrics: :mod:`exciting_environments_tpu.parallel.metrics` running
  statistics over the observation channels plus a wall-time window;
* sink: :class:`exciting_environments_tpu.io.ShardWriter` (optional);
* checkpoints: :mod:`exciting_environments_tpu.utils.checkpoint` (optional).

No reference counterpart (SURVEY §5 lists every one of these subsystems as
absent upstream).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from exciting_environments_tpu.parallel.metrics import (
    running_init,
    running_summary,
    running_update,
    window_init,
    window_mean,
    window_push,
)


# Exception types elastic recovery must NOT retry: these are deterministic —
# the replayed chunk would raise the same way (the NaN gate's
# FloatingPointError, out-of-scope/shape/contract ValueErrors and TypeErrors,
# plain Python bugs in user-supplied action sources or metric hooks).
# Transient device/runtime failures surface as RuntimeError (XlaRuntimeError)
# or OSError and stay retryable.
_NON_RETRYABLE = (
    FloatingPointError,
    ValueError,
    TypeError,
    KeyError,
    IndexError,
    AttributeError,
    NotImplementedError,
    AssertionError,
)


def _select_rollout(env_or_sharded, interpret: bool):
    """The fastest supported rollout path for this environment, as a callable
    ``(state, actions_norm) -> (final_obs, final_state)`` plus its name (one
    of ``"sharded_fused"``, ``"sharded_scan"``, ``"pmsm_fused"``, ``"fused"``,
    ``"scan"`` — probe ahead of time with
    :func:`exciting_environments_tpu.ops.pallas.rollout_path`)."""
    from exciting_environments_tpu.parallel.mesh import ShardedEnv

    if isinstance(env_or_sharded, ShardedEnv):
        senv = env_or_sharded
        # same CPU-backend guard as the single-chip lanes below: an in-scope
        # env would otherwise route to a compiled Mosaic kernel that cannot
        # lower on a CPU (virtual-device) mesh
        if not interpret and jax.default_backend() == "cpu":

            def run(state, actions):
                obs, last = senv.vmap_rollout(state, actions, actions.shape[1])
                return obs[:, -1], last

            return run, senv.env, "sharded_scan"

        def run(state, actions):
            return senv.fused_rollout(state, actions, interpret=interpret)

        name = "sharded_fused" if senv._fused_in_scope() else "sharded_scan"
        return run, senv.env, name

    env = env_or_sharded
    from exciting_environments_tpu.models.pmsm.pmsm_env import PMSM
    from exciting_environments_tpu.ops.pallas.pmsm_stepper import (
        pmsm_fused_rollout,
        supports_pmsm_fused,
    )
    from exciting_environments_tpu.ops.pallas.stepper import (
        env_fused_rollout,
        supports_fused_rollout,
    )

    if (
        isinstance(env, PMSM)
        and supports_pmsm_fused(env)
        and (interpret or jax.default_backend() != "cpu")
    ):

        def run(state, actions):
            return pmsm_fused_rollout(
                env, state, actions,
                gather="take" if interpret else "int8", interpret=interpret,
            )

        return run, env, "pmsm_fused"
    if supports_fused_rollout(env) and (interpret or jax.default_backend() != "cpu"):

        def run(state, actions):
            return env_fused_rollout(env, state, actions, interpret=interpret)

        return run, env, "fused"

    def run(state, actions):
        obs, last = env.vmap_rollout(state, actions, actions.shape[1])
        return obs[:, -1], last

    return run, env, "scan"


def _select_closed_loop(env_or_sharded, policy, interpret: bool):
    """The fastest supported CLOSED-loop path as ``(state, n_steps,
    policy_params) -> (final_obs, final_state)`` plus its name (one of
    ``"sharded_closed_loop"``, ``"pmsm_closed_loop_fused"``,
    ``"closed_loop_fused"``, ``"closed_loop_scan"``).

    The policy keeps the tile contract everywhere — ``policy(obs_tuple,
    step[, params]) -> action component tuple`` with ``obs_tuple`` indexable
    per observation column — so the same policy runs in-kernel and, for
    out-of-scope environments, over ``(B,)`` observation columns in the scan
    fallback (elementwise policies behave identically on both shapes).
    """
    import functools

    from exciting_environments_tpu.models.pmsm.pmsm_env import PMSM
    from exciting_environments_tpu.ops.pallas import select_closed_loop
    from exciting_environments_tpu.parallel.mesh import ShardedEnv

    if isinstance(env_or_sharded, ShardedEnv):
        senv = env_or_sharded
        # commit to the per-shard kernel only when it is actually in scope
        # AND compilable: on a CPU (virtual-device) mesh without interpret
        # Mosaic cannot lower, and an out-of-scope env (per-shard tiling,
        # non-scalar normalizations) would raise on every chunk — both cases
        # ride the scan fallback below instead, which jit auto-partitions
        # over the sharded state arrays
        if (interpret or jax.default_backend() != "cpu") and senv.closed_loop_in_scope(
            interpret
        ):

            def run(state, n_steps, policy_params, policy_carry=None):
                return senv.fused_closed_loop(
                    state, policy, n_steps, interpret=interpret,
                    policy_params=policy_params, policy_carry=policy_carry,
                )

            return run, senv.env, "sharded_closed_loop"
        env = senv.env
        from exciting_environments_tpu.utils.collect import tile_policy_scan

        @functools.partial(jax.jit, static_argnums=1)
        def run(state, n_steps, policy_params, policy_carry=None):
            return tile_policy_scan(
                env, state, n_steps, policy, policy_params,
                collect_trajectory=False, policy_carry=policy_carry,
            )

        return run, env, "closed_loop_scan"

    env = env_or_sharded
    kernel, extra = (
        select_closed_loop(env, interpret)
        if (interpret or jax.default_backend() != "cpu")
        else (None, {})
    )
    if kernel is not None:

        def run(state, n_steps, policy_params, policy_carry=None):
            return kernel(
                env, state, policy, n_steps, interpret=interpret,
                policy_params=policy_params, policy_carry=policy_carry, **extra,
            )

        name = "pmsm_closed_loop_fused" if isinstance(env, PMSM) else "closed_loop_fused"
        return run, env, name

    # scan fallback: the tile policy runs on (B,) observation columns
    from exciting_environments_tpu.utils.collect import tile_policy_scan

    @functools.partial(jax.jit, static_argnums=1)
    def run(state, n_steps, policy_params, policy_carry=None):
        return tile_policy_scan(
            env, state, n_steps, policy, policy_params,
            collect_trajectory=False, policy_carry=policy_carry,
        )

    return run, env, "closed_loop_scan"


class FleetRunner:
    """Chunked fleet data-generation loop.

    Args:
        env: a :class:`CoreEnvironment` or
            :class:`~exciting_environments_tpu.parallel.mesh.ShardedEnv`.
        writer: optional :class:`~exciting_environments_tpu.io.ShardWriter`;
            each chunk's ``(final_obs, actions?)`` record is appended.
        write_actions: also sink each chunk's action slab (large!).
        checkpoint_dir: when set, a self-contained checkpoint — simulation
            state plus the loop's statistics and counters — is written every
            ``checkpoint_every`` chunks; after a process death, a fresh
            runner picks up with :meth:`resume`.
        checkpoint_every: checkpoint period in chunks (0 disables).
        window: wall-time window length for the throughput readout.
        interpret: run Pallas kernels in interpreter mode (CPU testing).
    """

    def __init__(
        self,
        env,
        writer=None,
        write_actions: bool = False,
        checkpoint_dir: str = None,
        checkpoint_every: int = 0,
        window: int = 32,
        interpret: bool = False,
    ):
        self._rollout, self._base_env, self.rollout_path = _select_rollout(env, interpret)
        self._interpret = interpret
        # surface the selection once — a scan fallback is a 10-100x
        # performance cliff the user should see, not discover from timings
        logging.getLogger(__name__).info(
            "FleetRunner: selected rollout path %r for %s",
            self.rollout_path, type(self._base_env).__name__,
        )
        self.env = env
        self.writer = writer
        self.write_actions = write_actions
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = int(checkpoint_every)
        self.obs_stats = running_init(
            shape=(len(self._base_env.obs_description),), dtype=jnp.float32
        )
        self.time_window = window_init(window, dtype=jnp.float32)
        # per-chunk env-step counts over the SAME window, so the throughput
        # readout stays correct when chunk sizes vary across the runner's
        # lifetime (mixed run()/run_policy() chunk_steps, resume())
        self.steps_window = window_init(window, dtype=jnp.float32)
        self.chunks_run = 0
        self.env_steps = 0

    def run(
        self,
        state,
        action_source: Callable,
        n_chunks: int,
        chunk_steps: int,
        metric_hook: Callable = None,
        max_retries: int = 0,
    ):
        """Run ``n_chunks`` rollout chunks of ``chunk_steps`` steps each.

        Args:
            state: batched (possibly sharded) initial state.
            action_source: ``action_source(chunk_index) -> (B, chunk_steps,
                action_dim)`` normalized actions (e.g. a closure over
                :mod:`ops.signals` generators).
            metric_hook: optional ``hook(chunk_index, final_obs, state)``
                called after each chunk (e.g. to feed external telemetry).
            max_retries: elastic recovery — on a transient device/runtime
                failure, roll the loop back to an in-memory host snapshot of
                the last completed chunk (state AND statistics) and re-run,
                up to this many consecutive retries (see :meth:`_drive`).

        Returns:
            the final state.
        """

        def chunk(k, state):
            actions = action_source(k)
            t0 = time.perf_counter()  # host-side slab generation stays untimed
            obs, state = self._rollout(state, actions)
            record = {"final_obs": obs}
            if self.write_actions:
                record["actions"] = actions
            return obs, state, record, t0

        return self._drive(state, n_chunks, chunk_steps, chunk, metric_hook, max_retries)

    def run_policy(
        self,
        state,
        policy_tile: Callable,
        n_chunks: int,
        chunk_steps: int,
        policy_params=None,
        metric_hook: Callable = None,
        max_retries: int = 0,
        policy_carry=None,
    ):
        """Closed-loop variant of :meth:`run`: instead of an external action
        source, ``policy_tile(obs, step[, params])`` (the tile-policy
        contract of :func:`...pallas.stepper.env_fused_closed_loop`) drives
        each chunk — in-kernel on the fused paths, over ``(B,)`` observation
        columns on the scan fallback.  The selected path is cached per
        policy object and surfaced via :attr:`closed_loop_path`; all chunk
        bookkeeping (running statistics, NaN gate, sink, checkpoints,
        ``max_retries`` elastic recovery) matches :meth:`run`.

        ``policy_carry`` (tuple of ``(B,)`` float leaves) runs a STATEFUL
        law — ``policy(obs, step, carry[, params]) -> (action, carry)`` —
        with the carry threaded BETWEEN chunks like the simulation state:
        it snapshots/rolls back with elastic recovery, re-shards on a mesh,
        and lands in checkpoints (resume with
        ``like_state=(state_template, carry_template)`` and pass the
        returned carry back in).  Returns ``(final_state, final_carry)``
        instead of the plain final state.
        """
        cached = getattr(self, "_closed_loop", None)
        if cached is None or cached[0] is not policy_tile:
            run_fn, _, name = _select_closed_loop(self.env, policy_tile, self._interpret)
            self.closed_loop_path = name
            logging.getLogger(__name__).info(
                "FleetRunner: selected closed-loop path %r for %s",
                name, type(self._base_env).__name__,
            )
            self._closed_loop = cached = (policy_tile, run_fn)
        run_fn = cached[1]

        if policy_carry is None:

            def chunk(k, state):
                t0 = time.perf_counter()
                obs, state = run_fn(state, chunk_steps, policy_params)
                return obs, state, {"final_obs": obs}, t0

            return self._drive(state, n_chunks, chunk_steps, chunk, metric_hook, max_retries)

        def chunk(k, state_pc):
            st, pc = state_pc
            t0 = time.perf_counter()
            obs, st, pc = run_fn(st, chunk_steps, policy_params, tuple(pc))
            return obs, (st, pc), {"final_obs": obs}, t0

        return self._drive(
            (state, tuple(policy_carry)), n_chunks, chunk_steps, chunk,
            metric_hook, max_retries,
        )

    # -- elastic recovery ----------------------------------------------------

    def _snapshot(self, state):
        """Host-side copy of everything a rollback must restore: the
        simulation state plus the loop's running statistics and counters
        (so a replayed chunk is not double-counted)."""
        to_host = lambda tree: jax.tree_util.tree_map(np.asarray, tree)
        return (
            to_host(state), to_host(self.obs_stats), to_host(self.time_window),
            to_host(self.steps_window), self.chunks_run, self.env_steps,
        )

    def _restore(self, snapshot):
        """Re-place a snapshot; returns the state to resume from."""
        to_dev = lambda tree: jax.tree_util.tree_map(jnp.asarray, tree)
        host_state, obs_stats, time_window, steps_window, chunks_run, env_steps = snapshot
        self.obs_stats = to_dev(obs_stats)
        self.time_window = to_dev(time_window)
        self.steps_window = to_dev(steps_window)
        self.chunks_run = chunks_run
        self.env_steps = env_steps
        return self._place(to_dev(host_state))

    def _place(self, state):
        """Put a host-restored state back on its execution layout.  On a mesh
        this re-shards explicitly: the fused lanes shard their inputs anyway,
        but the closed-loop scan fallback steps whatever layout it is handed —
        without this, one retry would silently drop the whole remaining run
        to a single device."""
        from exciting_environments_tpu.parallel.mesh import ShardedEnv

        if isinstance(self.env, ShardedEnv):
            return self.env.shard(state)
        return state

    # -- checkpoint / resume (process-death recovery) --------------------------

    def _ckpt_payload(self, state):
        """Self-contained checkpoint pytree: the simulation state plus the
        loop bookkeeping a resumed runner must carry on (statistics and
        counters as arrays so both checkpoint backends round-trip them)."""
        return {
            "state": state,
            "obs_stats": self.obs_stats,
            "chunks_run": np.asarray(self.chunks_run, np.int64),
            "env_steps": np.asarray(self.env_steps, np.int64),
        }

    @staticmethod
    def latest_checkpoint(checkpoint_dir: str):
        """Path of the newest ``fleet_*`` checkpoint in ``checkpoint_dir``
        (``.npz`` file or orbax directory), or ``None`` when none exists."""
        best, best_n = None, -1
        for name in os.listdir(checkpoint_dir) if os.path.isdir(checkpoint_dir) else ():
            stem = name[:-4] if name.endswith(".npz") else name
            if not stem.startswith("fleet_"):
                continue
            try:
                n = int(stem.split("_", 1)[1])
            except ValueError:
                continue
            if n > best_n:
                best, best_n = os.path.join(checkpoint_dir, name), n
        return best

    def resume(self, like_state, path: str = None):
        """Pick up after a process death from an on-disk fleet checkpoint.

        Restores the loop's statistics and counters into this runner and
        returns ``(state, chunks_done)``.  The caller continues with
        :meth:`run`/:meth:`run_policy` for the *remaining* chunks; with a
        chunk-indexed action source, shift it by ``chunks_done``
        (``lambda k: source(k + chunks_done)``) so the excitation sequence
        continues where the dead process stopped.

        Args:
            like_state: a state pytree with the target structure (e.g. from
                ``env.vmap_reset()``).
            path: checkpoint to restore; default — the newest ``fleet_*``
                checkpoint in this runner's ``checkpoint_dir``.
        """
        from exciting_environments_tpu.utils.checkpoint import load_state

        if path is None:
            if not self.checkpoint_dir:
                raise ValueError("resume() needs a path or a checkpoint_dir")
            path = self.latest_checkpoint(self.checkpoint_dir)
            if path is None:
                raise FileNotFoundError(
                    f"no fleet_* checkpoint in {self.checkpoint_dir!r}"
                )
        payload = load_state(self._ckpt_payload(like_state), path)
        self.obs_stats = payload["obs_stats"]
        self.chunks_run = int(payload["chunks_run"])
        self.env_steps = int(payload["env_steps"])
        return self._place(payload["state"]), self.chunks_run

    def _drive(self, state, n_chunks, chunk_steps, chunk_fn, metric_hook, max_retries):
        """The chunk loop shared by :meth:`run` and :meth:`run_policy`.

        With ``max_retries > 0`` the loop keeps an in-memory host snapshot of
        the last completed chunk and, when a chunk raises a transient
        device/runtime error (relay outage, preempted worker, poisoned
        executable — on this runtime these surface at the statistics
        readback), rolls state *and* bookkeeping back and re-runs the chunk,
        up to ``max_retries`` consecutive times.  Deterministic exceptions
        (``_NON_RETRYABLE``: the NaN gate's ``FloatingPointError``,
        scope/shape/contract ``ValueError``/``TypeError``, plain Python bugs
        in user hooks) are never retried — the replay would raise the same
        way.  Snapshots cost
        one device→host copy of the state per chunk, so leave retries at 0
        for latency-critical sweeps.  The post-chunk snapshot itself runs
        inside the retry scope: on this runtime execution errors surface at
        device→host fetches, which may be the snapshot's own readback rather
        than the statistics fence.  If a failure lands after the shard
        writer appended (the gate fences before the writer, so this takes an
        IO error), the replayed chunk may duplicate one record name.

        ``chunk_fn(k, state) -> (obs, state, record, t0)`` returns its own
        timing origin so host-side work (e.g. an ``action_source`` building
        a slab in NumPy) stays out of the throughput readout.
        """
        snapshot = self._snapshot(state) if max_retries > 0 else None
        k = 0
        retries = 0
        while k < n_chunks:
            try:
                obs, new_state, record, t0 = chunk_fn(k, state)
                self._after_chunk(k, obs, new_state, chunk_steps, t0, record, metric_hook)
                new_snapshot = self._snapshot(new_state) if snapshot is not None else None
            except _NON_RETRYABLE:
                # deterministic: a replay would raise identically (NaN gate,
                # scope/shape/contract errors, bugs in user hooks) — don't
                # burn retries re-executing multi-minute chunks for nothing
                raise
            except Exception as e:
                if snapshot is None or retries >= max_retries:
                    raise
                retries += 1
                logging.getLogger(__name__).warning(
                    "fleet chunk %d failed (%r); retry %d/%d from the last "
                    "completed chunk", k, e, retries, max_retries,
                )
                state = self._restore(snapshot)
                continue
            retries = 0
            state = new_state
            snapshot = new_snapshot
            k += 1
        return state

    def _after_chunk(self, k, obs, state, chunk_steps, t0, record, metric_hook):
        # fence: fold the chunk's observations into the running stats and
        # read back one scalar — the only host<->device traffic per chunk
        self.obs_stats = running_update(self.obs_stats, obs, axis=(0,))
        if not bool(jnp.isfinite(self.obs_stats.mean).all()):
            raise FloatingPointError(
                f"fleet chunk {k}: non-finite observation statistics "
                "(enable utils.profiling.debug_nans to localize)"
            )
        self.time_window = window_push(self.time_window, time.perf_counter() - t0)
        chunk_env_steps = self._base_env.batch_size * chunk_steps
        self.steps_window = window_push(self.steps_window, chunk_env_steps)
        self.chunks_run += 1
        self.env_steps += chunk_env_steps

        if self.writer is not None:
            self.writer.append(record, name=f"chunk_{self.chunks_run:06d}")
        if (
            self.checkpoint_dir
            and self.checkpoint_every
            and (k + 1) % self.checkpoint_every == 0
        ):
            from exciting_environments_tpu.utils.checkpoint import save_state

            save_state(
                self._ckpt_payload(state),
                os.path.join(self.checkpoint_dir, f"fleet_{self.chunks_run:06d}"),
            )
        if metric_hook is not None:
            metric_hook(k, obs, state)

    def summary(self) -> dict:
        """Loop readout: per-channel observation statistics plus throughput."""
        s = running_summary(self.obs_stats)
        mean_chunk_seconds = float(window_mean(self.time_window))
        # steps-per-chunk from the same recent window as the wall time —
        # the lifetime average is wrong whenever chunk sizes varied
        steps_per_chunk = float(window_mean(self.steps_window))
        return {
            "chunks": self.chunks_run,
            "env_steps": self.env_steps,
            "obs_mean": s["mean"],
            "obs_std": s["std"],
            "obs_min": s["min"],
            "obs_max": s["max"],
            "mean_chunk_seconds": mean_chunk_seconds,
            "env_steps_per_sec": (
                steps_per_chunk / mean_chunk_seconds if mean_chunk_seconds > 0 else float("nan")
            ),
        }
