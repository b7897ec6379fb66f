"""Device-mesh batch sharding for environment simulation.

The reference's only parallelism is single-device ``jax.vmap`` over the batch
axis (``/root/reference/exciting_environments/core_env.py:566,612``); there is
no distributed backend at all (SURVEY §5).  On TPU the natural extension is
SPMD over a ``jax.sharding.Mesh``: environment steps are embarrassingly
parallel across the batch, so the batch axis is laid out over the mesh and
XLA/GSPMD partitions every step/rollout program with **zero** communication —
the only collectives are metric reductions
(:mod:`exciting_environments_tpu.parallel.metrics`) riding ICI.

Usage::

    mesh = make_batch_mesh()                       # 1-D mesh over all chips
    env = Pendulum(batch_size=65536)
    senv = ShardedEnv(env, mesh)                   # places properties + states
    obs, state = senv.vmap_reset()
    obs, state = senv.vmap_step(state, actions)    # SPMD across the mesh

``ShardedEnv`` wraps (not subclasses) an environment: it device_puts batched
inputs with a ``P('batch')`` sharding and replicates scalars, then calls the
untouched functional API — jit propagates the shardings through the whole
computation, so each chip steps its local slice of environments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"


def make_batch_mesh(devices=None, axis_name: str = BATCH_AXIS) -> Mesh:
    """Create a 1-D device mesh over ``devices`` (default: all devices)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = BATCH_AXIS) -> NamedSharding:
    """Sharding that splits the leading (batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated placement."""
    return NamedSharding(mesh, P())


def shard_batched_tree(tree, batch_size: int, mesh: Mesh, axis_name: str = BATCH_AXIS):
    """Place a pytree on the mesh: leaves with leading dim == ``batch_size``
    are split over the batch axis, everything else is replicated.

    This mirrors the vmap in-axes inference rule of the single-chip runtime
    (reference ``core_env.py:268-272``): per-batch heterogeneous leaves ride
    with their batch entries, scalars broadcast.
    """
    split = batch_sharding(mesh, axis_name)
    repl = replicated_sharding(mesh)

    def place(leaf):
        if not isinstance(leaf, jax.Array):
            # Python scalars stay Python scalars: several environments branch
            # on them at trace time (e.g. the PMSM deadtime, which selects the
            # buffer-swap program variant) and jit embeds them as constants —
            # wrapping them in arrays would turn static structure into traced
            # values.
            return leaf
        if leaf.ndim >= 1 and leaf.shape[0] == batch_size and batch_size % mesh.size == 0:
            return jax.device_put(leaf, split)
        return jax.device_put(leaf, repl)

    return jax.tree_util.tree_map(place, tree)


class ShardedEnv:
    """Mesh-sharded facade over a :class:`CoreEnvironment`.

    All batched methods accept/return pytrees whose batch-leading leaves are
    sharded over the mesh.  The wrapped environment is unmodified — the same
    jitted programs run SPMD because their inputs carry shardings.
    """

    def __init__(self, env, mesh: Mesh = None, axis_name: str = BATCH_AXIS):
        if mesh is None:
            mesh = make_batch_mesh(axis_name=axis_name)
        if env.batch_size % mesh.size != 0:
            raise ValueError(
                f"batch_size {env.batch_size} must be divisible by the mesh size {mesh.size}"
            )
        self.mesh = mesh
        self.axis_name = axis_name
        # the facade works on a shallow copy so the caller's env object is
        # truly unmodified (same class, same jitted programs); only the
        # copy's heterogeneous per-batch properties are re-placed alongside
        # their batch entries
        self.env = object.__new__(type(env))
        self.env.__dict__.update(env.__dict__)
        self.env.env_properties = shard_batched_tree(
            env.env_properties, env.batch_size, mesh, axis_name
        )
        self._fused_shadow = None  # lazily built per-shard env (fused_rollout)

    # -- placement helpers -------------------------------------------------

    def shard(self, tree):
        """Shard a batched pytree (state, actions, observations) over the mesh."""
        return shard_batched_tree(tree, self.env.batch_size, self.mesh, self.axis_name)

    def _local_shadow(self):
        """The per-shard shadow env (``batch_size = B / mesh.size``) driving
        local kernels inside ``shard_map``.

        Cached on the facade so the jitted kernels' static arguments (tile-ODE
        closure, clip bound method) stay identical across calls — a fresh
        shadow per call would retrace + recompile every time.  Jitted impls
        and tile-ODE closures inherited from the wrapped env's ``__dict__``
        are ALWAYS dropped: they close over the original object and bake its
        full batch size into the compiled program, so reusing one inside
        ``shard_map`` on per-shard slices would fail (or worse, mis-tile).
        """
        local_batch = self.env.batch_size // self.mesh.size
        shadow = self._fused_shadow
        if shadow is None or shadow.batch_size != local_batch:
            shadow = object.__new__(type(self.env))
            shadow.__dict__.update(self.env.__dict__)
            shadow.batch_size = local_batch
            for key in (
                "_pmsm_fused_impl", "_pmsm_fused_sim_ahead_impl",
                "_pmsm_cl_impl", "_fused_tile_ode", "_mppi_tiled_shadow",
            ):
                shadow.__dict__.pop(key, None)
            self._fused_shadow = shadow
        return shadow

    def _run_sharded(self, local_fn, init_state, actions_norm, time_major, extra=()):
        """Run ``local_fn(state, actions[, *extra]) -> outputs`` per shard
        under the mesh.

        ``shard_map`` gives each chip its local batch slice; stepping is
        embarrassingly parallel, so no collectives are inserted.  With
        ``time_major`` the action slab is ``(n_steps, B, A)`` — batch axis
        second — and is placed accordingly.  ``extra`` operands (per-batch
        property-leaf tuples) are batch-leading and shard like the state.
        ``check_vma=False``: ``pallas_call`` outputs carry no varying-mesh-
        axis metadata; the kernels are purely local per shard, so the check
        is vacuous here.
        """
        spec = P(self.axis_name)
        a_spec = P(None, self.axis_name) if time_major else spec
        sharded = jax.shard_map(
            local_fn,
            mesh=self.mesh,
            in_specs=(spec, a_spec) + tuple(spec for _ in extra),
            out_specs=spec,  # prefix: every output leaf batch-sharded
            check_vma=False,
        )
        if time_major:
            actions_sharded = jax.device_put(actions_norm, NamedSharding(self.mesh, a_spec))
        else:
            actions_sharded = self.shard(actions_norm)
        return sharded(self.shard(init_state), actions_sharded, *extra)

    def _batched_prop_operands(self):
        """Split the property tree for ``shard_map``: array leaves with a
        leading batch dim become sharded operands, everything else (scalar
        arrays and the static Python scalars jit specializes on) stays in
        the closure.  Returns ``(batched_leaves, merge)`` where
        ``merge(local_leaves)`` rebuilds the property pytree with a shard's
        local slices in place — the per-shard ``env_properties`` override
        the PMSM kernel launchers accept.

        Batched-ness comes from ``env.in_axes_env_properties`` — the single
        source of truth every vmap path already uses — rather than
        re-inferring from leaf shapes, so the physical data partitioning can
        never drift from the engine's own vmap semantics.  Both trees are
        flattened with ``None`` kept as a leaf: the in-axes tree mirrors the
        property tree field-for-field (``0``/``None`` per leaf), so the two
        flat lists correspond positionally."""
        keep_none = lambda x: x is None
        leaves, treedef = jax.tree_util.tree_flatten(
            self.env.env_properties, is_leaf=keep_none
        )
        ax_leaves = jax.tree_util.tree_leaves(
            self.env.in_axes_env_properties, is_leaf=keep_none
        )
        is_batched = [ax == 0 for ax in ax_leaves]
        batched = tuple(l for l, b in zip(leaves, is_batched) if b)

        def merge(local_leaves):
            it = iter(local_leaves)
            merged = [next(it) if b else l for l, b in zip(leaves, is_batched)]
            return jax.tree_util.tree_unflatten(treedef, merged)

        return batched, merge

    # -- forwarded batched API --------------------------------------------

    def vmap_reset(self, rng=None, initial_state=None):
        if rng is not None:
            rng = self.shard(rng)
        obs, state = self.env.vmap_reset(rng, initial_state)
        # For scalar-property envs nothing in the reset program carries a
        # batch sharding, so without this the state comes back replicated and
        # every downstream step would silently run single-device.
        return self.shard(obs), self.shard(state)

    def vmap_step(self, state, action):
        return self.env.vmap_step(state, self.shard(action))

    def vmap_sim_ahead(self, init_state, actions, obs_stepsize, action_stepsize):
        return self.env.vmap_sim_ahead(init_state, self.shard(actions), obs_stepsize, action_stepsize)

    def vmap_rollout(self, init_state, actions, obs_stride: int = 1):
        return self.env.vmap_rollout(init_state, self.shard(actions), obs_stride)

    def vmap_generate_rew_trunc_term_ahead(self, states, actions):
        return self.env.vmap_generate_rew_trunc_term_ahead(states, self.shard(actions))

    def _fused_in_scope(self, obs_stepsize=None, action_stepsize=None) -> bool:
        """Whether the fused kernels cover this env *per shard* (kernel scope
        + local-batch tiling + scalar params for the generic kernel + equal
        stepsizes for sim-ahead)."""
        import numpy as _np

        from exciting_environments_tpu.models.pmsm.pmsm_env import PMSM
        from exciting_environments_tpu.ops.pallas.pmsm_stepper import supports_pmsm_fused
        from exciting_environments_tpu.ops.pallas.stepper import (
            sim_ahead_ratio,
            supports_fused_rollout,
        )

        env = self.env
        local_batch = env.batch_size // self.mesh.size
        if local_batch % 1024 != 0:
            return False
        if isinstance(env, PMSM):
            # the PMSM kernel requires equal stepsizes (the reference PMSM
            # sim_ahead crashes on finer observation grids — preserved quirk);
            # the trajectory solve is deterministic-only
            if obs_stepsize is not None and (
                obs_stepsize != action_stepsize
                or getattr(env, "_has_noise", False)
            ):
                return False
            return supports_pmsm_fused(env)
        if obs_stepsize is not None and (
            sim_ahead_ratio(obs_stepsize, action_stepsize) is None
            # the trajectory solve is deterministic-only (vmap_sim_ahead
            # raises on stochastic envs); step-mode noise IS in fused scope
            or getattr(env, "_has_noise", False)
        ):
            return False
        # per-batch heterogeneous property leaves ride shard_map as sharded
        # operands (round 4): the local launch receives each shard's property
        # slices through the env_properties override, so randomized classic
        # fleets stay in fused scope under the mesh like the PMSM's
        return supports_fused_rollout(env)

    def fused_rollout(
        self,
        init_state,
        actions_norm,
        obs_stride: int = None,
        time_major: bool = False,
        interpret: bool = False,
        strict: bool = False,
        return_traj_states: bool = False,
    ):
        """Run the fused Pallas rollout kernel per shard under the mesh.

        Each chip keeps its local batch slice resident in VMEM for the whole
        horizon.  The local batch (``batch_size / mesh.size``) must satisfy
        the kernel's tiling constraints (multiple of 1024); out-of-scope
        environments fall back to the sharded scan path like the single-chip
        wrapper does — 10-100x slower, so pass ``strict=True`` to raise
        instead (or probe with :func:`...ops.pallas.rollout_path`).

        ``time_major=True`` takes actions ``(n_steps, B, A)`` — the layout
        the kernel streams; batch-major input costs a full transposed copy
        of each chip's slab per call (see the single-chip wrapper).
        """
        from exciting_environments_tpu.models.pmsm.pmsm_env import PMSM
        from exciting_environments_tpu.ops.pallas.pmsm_stepper import pmsm_fused_rollout
        from exciting_environments_tpu.ops.pallas.stepper import env_fused_rollout

        env = self.env
        n_steps = actions_norm.shape[0] if time_major else actions_norm.shape[1]

        if not self._fused_in_scope():
            if strict:
                raise ValueError(
                    "fused_rollout out of scope for this sharded env (kernel scope, "
                    "per-shard tiling, or per-batch heterogeneous params); "
                    "strict=True forbids the sharded scan fallback"
                )
            if return_traj_states:
                raise ValueError(
                    "return_traj_states requires the fused kernel path; this "
                    "sharded env is out of kernel scope"
                )
            if time_major:
                actions_norm = jnp.transpose(actions_norm, (1, 0, 2))
            obs, last = self.vmap_rollout(init_state, actions_norm, obs_stride or n_steps)
            return (obs if obs_stride is not None else obs[:, -1]), last

        shadow = self._local_shadow()
        if isinstance(env, PMSM):
            # the PMSM has its own fused kernel (constraint pre-pass +
            # VMEM-resident current integration); the "take" gather only
            # lowers in interpreter mode (CPU testing); compiled runs use
            # the exact one-hot MXU gather.  Per-batch heterogeneous
            # property leaves ride the mesh as sharded operands and each
            # shard launches with its local property slices.
            batched_props, merge_props = self._batched_prop_operands()

            def local(state, actions, prop_leaves):
                return pmsm_fused_rollout(
                    shadow, state, actions,
                    obs_stride=obs_stride, time_major=time_major,
                    gather="take" if interpret else "int8", interpret=interpret,
                    return_traj_states=return_traj_states,
                    env_properties=merge_props(prop_leaves) if batched_props else None,
                )

            return self._run_sharded(
                local, init_state, actions_norm, time_major, extra=(batched_props,)
            )

        batched_props, merge_props = self._batched_prop_operands()

        def local(state, actions, prop_leaves):
            return env_fused_rollout(
                shadow, state, actions, obs_stride=obs_stride,
                time_major=time_major, interpret=interpret,
                return_traj_states=return_traj_states,
                env_properties=merge_props(prop_leaves) if batched_props else None,
            )

        return self._run_sharded(
            local, init_state, actions_norm, time_major, extra=(batched_props,)
        )

    def fused_sim_ahead(
        self,
        init_state,
        actions_norm,
        obs_stepsize: float,
        action_stepsize: float,
        obs_stride: int = 1,
        time_major: bool = False,
        interpret: bool = False,
        strict: bool = False,
    ):
        """Fused trajectory solve per shard (``env_fused_sim_ahead`` under
        ``shard_map``): ``vmap_sim_ahead`` semantics, returning
        ``(observations, last_state)`` with batch-sharded leaves.
        Out-of-scope configurations ride the sharded ``vmap_sim_ahead`` path
        (``strict=True`` raises instead)."""
        from exciting_environments_tpu.models.pmsm.pmsm_env import PMSM
        from exciting_environments_tpu.ops.pallas.pmsm_stepper import pmsm_fused_sim_ahead
        from exciting_environments_tpu.ops.pallas.stepper import env_fused_sim_ahead

        env = self.env

        if not self._fused_in_scope(obs_stepsize, action_stepsize):
            if strict:
                raise ValueError(
                    "fused_sim_ahead out of scope for this sharded env; "
                    "strict=True forbids the sharded scan fallback"
                )
            if time_major:
                actions_norm = jnp.transpose(actions_norm, (1, 0, 2))
            obs, _, last = self.vmap_sim_ahead(
                init_state, actions_norm, obs_stepsize, action_stepsize
            )
            return obs[:, ::obs_stride], last

        shadow = self._local_shadow()
        if isinstance(env, PMSM):
            batched_props, merge_props = self._batched_prop_operands()

            def local(state, actions, prop_leaves):
                obs, last = pmsm_fused_sim_ahead(
                    shadow, state, actions, obs_stepsize, action_stepsize,
                    time_major=time_major,
                    gather="take" if interpret else "int8", interpret=interpret,
                    env_properties=merge_props(prop_leaves) if batched_props else None,
                )
                return obs[:, ::obs_stride], last

            return self._run_sharded(
                local, init_state, actions_norm, time_major, extra=(batched_props,)
            )

        batched_props, merge_props = self._batched_prop_operands()

        def local(state, actions, prop_leaves):
            return env_fused_sim_ahead(
                shadow, state, actions, obs_stepsize, action_stepsize,
                obs_stride=obs_stride, time_major=time_major, interpret=interpret,
                env_properties=merge_props(prop_leaves) if batched_props else None,
            )

        return self._run_sharded(
            local, init_state, actions_norm, time_major, extra=(batched_props,)
        )

    def closed_loop_in_scope(self, interpret: bool = False) -> bool:
        """Whether :meth:`fused_closed_loop` covers this env per shard
        (closed-loop kernel scope plus local-batch tiling).  Probe this
        before committing a production loop to the kernel lane.

        Per-batch property leaves ride the sharded closed loop for the PMSM
        drive kernel (round 5): each shard's property slices pass as
        ``shard_map`` operands into the launcher's ``env_properties`` hook,
        exactly like the open-loop paths — a ``u_dc``- or
        winding-randomized fleet closes its loops in-kernel under the mesh.
        The generic classic-env closed-loop kernel still folds
        normalizations as compile-time scalars, so heterogeneous classic
        fleets close their loops through
        ``RolloutCollector.collect_policy``."""
        import numpy as _np

        from exciting_environments_tpu.models.pmsm.pmsm_env import PMSM
        from exciting_environments_tpu.ops.pallas import select_closed_loop

        kernel, _ = select_closed_loop(self.env, interpret)
        if kernel is None:
            return False
        if not isinstance(self.env, PMSM):
            # the generic kernel reads the env's own (scalar) properties
            if not all(
                _np.isscalar(leaf)
                for leaf in jax.tree_util.tree_leaves(self.env.env_properties)
            ):
                return False
        return (self.env.batch_size // self.mesh.size) % 1024 == 0

    def fused_closed_loop(self, init_state, policy, n_steps: int,
                          obs_stride: int = None, interpret: bool = False,
                          policy_params=None, return_traj_states: bool = False,
                          policy_carry=None, sched_lut=None):
        """Policy-in-kernel closed loop per shard: each chip runs its local
        slice's observation -> action -> step loop fully in VMEM (see
        :func:`...ops.pallas.stepper.env_fused_closed_loop`).  The policy is
        elementwise over tiles, so sharding it is trivially zero-communication
        — including a STATEFUL policy's ``policy_carry``, whose per-instance
        ``(B,)`` leaves shard with their batch entries (generic and PMSM
        drive kernels alike).  Raises out of scope — a closed loop has no
        open-loop fallback."""
        from exciting_environments_tpu.ops.pallas import select_closed_loop

        env = self.env
        kernel, extra = select_closed_loop(env, interpret)
        if not self.closed_loop_in_scope(interpret):
            raise ValueError(
                "fused_closed_loop out of scope for this sharded env (kernel "
                "scope, scalar normalizations, or per-shard tiling)"
            )
        shadow = self._local_shadow()
        spec = P(self.axis_name)
        # per-batch heterogeneous PMSM fleets: each shard's property slices
        # ride as shard_map operands into the launcher's env_properties hook
        # (the generic lane is all-scalar by closed_loop_in_scope)
        batched_props, merge_props = self._batched_prop_operands()

        def _kw(prop_leaves):
            kw = {"env_properties": merge_props(prop_leaves)} if batched_props else {}
            if sched_lut is not None:
                # PMSM-only feature (select_closed_loop picked the drive
                # kernel); the gathered maps are replicated constants
                kw["sched_lut"] = sched_lut
            return kw

        if policy_carry is None:

            def local(state, prop_leaves):
                return kernel(
                    shadow, state, policy, n_steps,
                    obs_stride=obs_stride, interpret=interpret,
                    policy_params=policy_params,
                    return_traj_states=return_traj_states, **extra,
                    **_kw(prop_leaves),
                )

            sharded = jax.shard_map(
                local, mesh=self.mesh, in_specs=(spec, spec),
                out_specs=spec,  # prefix: every output leaf batch-sharded
                check_vma=False,
            )
            return sharded(self.shard(init_state), batched_props)

        def local(state, carry, prop_leaves):
            return kernel(
                shadow, state, policy, n_steps,
                obs_stride=obs_stride, interpret=interpret,
                policy_params=policy_params,
                return_traj_states=return_traj_states,
                policy_carry=carry, **extra, **_kw(prop_leaves),
            )

        sharded = jax.shard_map(
            local, mesh=self.mesh, in_specs=(spec, spec, spec),
            out_specs=spec, check_vma=False,
        )
        return sharded(
            self.shard(init_state), self.shard(tuple(policy_carry)), batched_props
        )

    def adaptive_rollout(self, init_state, actions_norm, **kwargs):
        """Per-instance adaptive rollout, sharded over the mesh.

        The controller is elementwise over the batch, so each chip runs its
        local shard's ``lax.while_loop`` independently — chips converge at
        their own pace with no collectives (a stiff shard does not stall the
        others between intervals).

        Per-batch heterogeneous parameters are supported: ``(B,)`` property
        leaves ride the mesh as sharded ``shard_map`` operands and each shard
        integrates with its local parameter slice (scalar leaves and static
        Python scalars stay in the closure).
        """
        from exciting_environments_tpu.ops.adaptive import adaptive_rollout

        shadow = self._local_shadow()

        # split the property tree: batched leaves are shard_map operands
        # (split over the mesh), everything else — scalar arrays and the
        # static Python scalars jit specializes on — is closed over and
        # implicitly replicated (shared helper, same split as every kernel
        # path)
        batched_leaves, merge = self._batched_prop_operands()

        spec = P(self.axis_name)

        def local(state, actions, local_prop_leaves):
            props = merge(local_prop_leaves)
            return adaptive_rollout(shadow, state, actions, env_properties=props, **kwargs)

        sharded = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(spec, spec, spec),
            out_specs=(spec, spec, spec),
            check_vma=False,
        )
        return sharded(self.shard(init_state), self.shard(actions_norm), batched_leaves)

    def __getattr__(self, name):
        return getattr(self.env, name)
