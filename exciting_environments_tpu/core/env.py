"""Core batched ODE-environment runtime (TPU-native re-design of the reference's
``exciting_environments/core_env.py``).

Public surface parity (reference ``core_env.py:15-705``):
``CoreEnvironment`` with nested ``State``/``EnvProperties`` pytrees, the
single-sample methods ``reset`` / ``step`` / ``sim_ahead`` /
``generate_rew_trunc_term_ahead``, normalization helpers, and the batched
``vmap_*`` family with per-batch-heterogeneous property support via in-axes
inference (``core_env.py:253-277``).

TPU-first differences from the reference architecture:

* The per-environment diffrax calls are replaced by ONE shared integration
  path: ``_ode_solver_step`` / ``_ode_solver_simulate_ahead`` are implemented
  generically here on top of the in-house solver protocol
  (:mod:`exciting_environments_tpu.ops.solvers`) and the ``lax.scan``
  trajectory engine (:mod:`exciting_environments_tpu.ops.rollout`).
  Environments only declare their vector field ``_ode`` plus small metadata
  hooks (integrated field order, angle wrapping, post-step clipping) — the
  six reference models repeat ~100 lines of solver plumbing each
  (e.g. ``pendulum_env.py:152-259``); here that lives in one place and
  compiles to identical XLA.
* Everything is shape-static and branch-free inside ``jit`` so the whole
  batched step fuses into a single device computation, vmappable over the
  batch axis and shardable over a ``jax.sharding.Mesh``
  (see :mod:`exciting_environments_tpu.parallel`).
"""

from __future__ import annotations

from dataclasses import fields
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.tree_util import tree_flatten, tree_structure

from exciting_environments_tpu.core import structures
from exciting_environments_tpu.core.structures import pytree_dataclass
from exciting_environments_tpu.ops.rollout import solve_trajectory, zoh_action
from exciting_environments_tpu.ops.solvers import Euler, make_solver


class CoreEnvironment:
    """Base class for batched physical-simulation environments.

    The simulated system is a physical state-space model
    ``dx(t)/dt = f(x(t), u(t))`` discretized by a fixed-step ODE solver; the
    environment *state* additionally carries a PRNG key, solver carry
    ("additions") and a reference target for tracking tasks (reference
    ``core_env.py:22-33, 236-243``).

    Subclasses provide:
      * nested pytree dataclasses ``PhysicalState``, ``Additions``,
        ``StaticParams``, ``Action``;
      * the vector field ``_ode(t, y, args, action)`` over a tuple-state ``y``;
      * ``_ode_state_fields`` — ordered names of the ``PhysicalState`` fields
        that make up ``y`` (defaults to all fields);
      * optionally ``_angle_fields`` (wrapped to (-pi, pi] after integration)
        and ``_clip_state`` (post-step saturation, e.g. the fluid tank's
        ``h >= 0`` clip, reference ``fluid_tank_env.py:146``);
      * observation/reward/reset hooks (``init_state``,
        ``generate_observation``, ``generate_state_from_observation``,
        ``generate_reward``, ``generate_truncated``, ``generate_terminated``).
    """

    #: PhysicalState fields integrated by the ODE, in y-tuple order.
    _ode_state_fields: tuple = ()
    #: subset of ``_ode_state_fields`` wrapped into (-pi, pi] after each step.
    _angle_fields: tuple = ()
    #: additive process-noise diffusion per physical field (``None`` = the
    #: exact deterministic path; set via the classic constructor's
    #: ``process_noise=`` — see :meth:`step`).
    _process_noise: dict = None
    #: sensor-noise std per observed physical field in physical units
    #: (``None`` = exact observations).
    _observation_noise: dict = None
    #: noise draw-stream mode: ``"exact"`` chains ``split(key, 3)`` per step
    #: (step-by-step ≡ rollout, but inherently sequential over time);
    #: ``"fast"`` derives each step's draws counter-style from the rollout's
    #: starting key (``fold_in(key, t)``) so whole-rollout noise generation is
    #: time-parallel — see :meth:`_noise_slabs`.
    _noise_mode: str = "exact"

    def __init__(self, batch_size: int, env_properties, tau: float = 1e-4, solver=None):
        """
        Args:
            batch_size: Number of parallel environment instances.
            env_properties: Pytree dataclass with all normalizations and
                static parameters of the environment.
            tau: Duration of one control step in seconds.
            solver: An ``ODESolver`` instance or registry name
                (default: explicit Euler, like the reference ``core_env.py:41``).
        """
        self.batch_size = batch_size
        self.tau = tau
        self._solver = make_solver(solver) if solver is not None else Euler()
        self.env_properties = env_properties
        self.in_axes_env_properties = self.create_in_axes_dataclass(env_properties)
        self.action_dim = len(fields(self.Action))
        self.physical_state_dim = len(fields(self.PhysicalState))

    # ------------------------------------------------------------------
    # state containers (reference core_env.py:236-251)
    # ------------------------------------------------------------------

    @pytree_dataclass
    class State:
        """Full environment state: physical state + PRNG key + solver carry +
        tracking reference."""

        physical_state: object
        PRNGKey: jax.Array
        additions: object
        reference: object

    @pytree_dataclass
    class EnvProperties:
        """Constant-per-simulation properties."""

        physical_normalizations: object
        action_normalizations: object
        static_params: object

    # ------------------------------------------------------------------
    # in-axes inference for heterogeneous per-batch properties
    # (reference core_env.py:253-277)
    # ------------------------------------------------------------------

    def create_in_axes_dataclass(self, dataclass_obj):
        """Derive a vmap in-axes tree: leaves whose leading dimension equals
        ``batch_size`` map along axis 0, scalars broadcast (axis ``None``)."""
        with structures.copy_and_mutate(dataclass_obj, validate=False) as in_axes_tree:
            for field in fields(in_axes_tree):
                name = field.name
                value = getattr(in_axes_tree, name)
                if value is None:
                    setattr(in_axes_tree, name, None)
                elif isinstance(value, list):
                    raise ValueError(
                        f'Passed env property "{name}" needs to be a jnp.array to have '
                        "different setting per batch, but list is given."
                    )
                elif structures.is_dataclass(value):
                    setattr(in_axes_tree, name, self.create_in_axes_dataclass(value))
                elif jnp.isscalar(value):
                    setattr(in_axes_tree, name, None)
                elif isinstance(value, jax.numpy.ndarray):
                    if value.ndim >= 1 and value.shape[0] == self.batch_size:
                        setattr(in_axes_tree, name, 0)
                    else:
                        setattr(in_axes_tree, name, None)
                else:
                    raise ValueError(
                        f'Passed env property "{name}" needs to be a scalar, jnp.array or '
                        f"pytree dataclass, but {type(value)} is given."
                    )
        return in_axes_tree

    def repeat_values(self, x, n_repeat):
        """Broadcast a scalar-leaved pytree to a leading time axis of length
        ``n_repeat`` (used to tile solver carries over saved trajectories,
        reference ``core_env.py:279-290``)."""
        if x is None:
            return None
        elif isinstance(x, tuple):
            return tuple(self.repeat_values(i, n_repeat) for i in x)
        elif isinstance(x, jax.numpy.ndarray):
            return jnp.full(n_repeat, x)
        elif isinstance(x, (float, bool, int)):
            return jnp.full(n_repeat, x)
        else:
            raise ValueError(
                f"State needs to consist of jnp.array, tuple, float or bool, but {type(x)} is given."
            )

    def _tile_time(self, x, n):
        """Broadcast a (possibly non-scalar, e.g. PRNG key) leaf to a leading
        time axis of length ``n``.  Unlike ``repeat_values`` this handles
        arbitrary leaf shapes — the reference's ``jnp.full`` equivalent breaks
        for keyed states (``pendulum_env.py:253``)."""
        x = jnp.asarray(x)
        return jnp.broadcast_to(x, (n,) + x.shape)

    @staticmethod
    def _index_time(states, idx):
        """Per-leaf time indexing of a time-major ``State`` pytree (replaces
        the reference's ragged-unsafe ``jnp.array(tree_flatten(...))`` stacking,
        ``core_env.py:485-486``)."""
        return jax.tree_util.tree_map(lambda leaf: leaf[idx], states)

    # ------------------------------------------------------------------
    # normalization (reference core_env.py:292-359)
    # ------------------------------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def normalize_state(self, state, env_properties):
        """Map physical state and reference into the normalized [-1, 1] band."""
        physical_normalizations = env_properties.physical_normalizations
        with structures.copy_and_mutate(state, validate=True) as norm_state:
            for field in fields(norm_state.physical_state):
                name = field.name
                norm = getattr(physical_normalizations, name)
                setattr(norm_state.physical_state, name, norm.normalize(getattr(state.physical_state, name)))
                setattr(norm_state.reference, name, norm.normalize(getattr(state.reference, name)))
        return norm_state

    @partial(jax.jit, static_argnums=0)
    def denormalize_state(self, norm_state, env_properties):
        """Inverse of :meth:`normalize_state`."""
        physical_normalizations = env_properties.physical_normalizations
        with structures.copy_and_mutate(norm_state, validate=True) as state:
            for field in fields(state.physical_state):
                name = field.name
                norm = getattr(physical_normalizations, name)
                setattr(state.physical_state, name, norm.denormalize(getattr(norm_state.physical_state, name)))
                setattr(state.reference, name, norm.denormalize(getattr(norm_state.reference, name)))
        return state

    @partial(jax.jit, static_argnums=0)
    def denormalize_action(self, action_norm, env_properties):
        """Denormalize a normalized action vector component-wise."""
        normalizations = env_properties.action_normalizations
        action_denorm = jnp.zeros_like(action_norm)
        for i, field in enumerate(fields(normalizations)):
            norms = getattr(normalizations, field.name)
            action_denorm = action_denorm.at[i].set(norms.denormalize(action_norm[i]))
        return action_denorm

    # ------------------------------------------------------------------
    # generic ODE integration (replaces per-env diffrax plumbing,
    # reference pendulum_env.py:152-259 and siblings)
    # ------------------------------------------------------------------

    def _ode(self, t, y, args, action):
        """Vector field ``dy/dt``; must be provided by the environment."""
        raise NotImplementedError

    def _clip_state(self, y):
        """Optional post-step saturation of the integrated tuple-state."""
        return y

    def _vector_field(self, action_callable: Callable) -> Callable:
        return lambda t, y, args: self._ode(t, y, args, action_callable)

    def _physical_to_y(self, physical_state):
        return tuple(getattr(physical_state, name) for name in self._ode_state_fields)

    def _wrap_angles(self, y):
        if not self._angle_fields:
            return y
        y = list(y)
        for name in self._angle_fields:
            i = self._ode_state_fields.index(name)
            y[i] = ((y[i] + jnp.pi) % (2 * jnp.pi)) - jnp.pi
        return tuple(y)

    @partial(jax.jit, static_argnums=0)
    def _ode_solver_step(self, state, action, static_params):
        """One fixed-step integration over ``[0, tau]`` with lazily
        initialized solver carry (reference pattern ``pendulum_env.py:152-194``)."""
        f = self._vector_field(lambda t: action)
        y0 = self._physical_to_y(state.physical_state)
        args = static_params
        t0, t1 = 0.0, self.tau

        # The solver carry is re-initialized against the CURRENT action every
        # step.  This matches the reference's net behavior: its lax.cond
        # (pendulum_env.py:178-184) passes the *re-init* branch in the true
        # position, so active states re-init each step, and the inactive
        # (post-reset) branch's NaN-dummy carry is rescued by diffrax's
        # internal first-step flag — i.e. k1 is always a fresh evaluation.
        # Reusing the previous step's FSAL stage here would evaluate k1 under
        # the PREVIOUS action — silently wrong dynamics when actions vary.
        additions = self.Additions(
            solver_state=self._solver.init(f, t0, t1, y0, args),
            active_solver_state=True,
        )
        y1, solver_state_k1 = self._solver.step(f, t0, t1, y0, args, additions.solver_state)
        y1 = self._wrap_angles(y1)
        y1 = self._clip_state(y1)

        new_physical_state = self.PhysicalState(**dict(zip(self._ode_state_fields, y1)))
        new_state = structures.replace(
            state,
            physical_state=new_physical_state,
            additions=self.Additions(solver_state=solver_state_k1, active_solver_state=True),
        )
        return new_state

    @partial(jax.jit, static_argnums=[0, 4, 5])
    def _ode_solver_simulate_ahead(self, init_state, actions, static_params, obs_stepsize, action_stepsize):
        """Full-trajectory integration via ``lax.scan``; returns a time-major
        ``State`` whose leaves carry a leading ``obs_len`` axis (reference
        contract ``pendulum_env.py:196-259``)."""
        f = self._vector_field(zoh_action(actions, action_stepsize))
        y0 = self._physical_to_y(init_state.physical_state)
        args = static_params
        t1 = action_stepsize * actions.shape[0]
        n_steps = int(t1 / obs_stepsize)

        ys, _ = solve_trajectory(self._solver, f, y0, args, n_steps, obs_stepsize)
        ys = self._wrap_angles(ys)
        ys = self._clip_state(ys)
        obs_len = n_steps + 1

        physical_states = self.PhysicalState(**dict(zip(self._ode_state_fields, ys)))
        reference = self.PhysicalState(
            **{
                field.name: jnp.full(obs_len, getattr(init_state.reference, field.name))
                for field in fields(self.PhysicalState)
            }
        )
        y_last = tuple(leaf[-1] for leaf in ys)
        solver_state = self._solver.init(f, t1, t1 + self.tau, y_last, args)
        additions = self.Additions(
            solver_state=self.repeat_values(solver_state, obs_len),
            active_solver_state=jnp.full(obs_len, True),
        )
        return self.State(
            physical_state=physical_states,
            PRNGKey=self._tile_time(init_state.PRNGKey, obs_len),
            additions=additions,
            reference=reference,
        )

    def _init_solver_additions(self, env_properties, physical_state, nan_fill=True):
        """Build the ``Additions`` carry for a fresh state: the solver carry is
        initialized against a zero-action vector field and NaN-poisoned so a
        first ``step`` visibly re-initializes it (reference
        ``pendulum_env.py:278-292``)."""
        zero_action = jnp.zeros(self.action_dim)
        f = self._vector_field(lambda t: zero_action)
        y0 = self._physical_to_y(physical_state)
        solver_state = self._solver.init(f, 0.0, self.tau, y0, env_properties.static_params)
        if nan_fill:
            solver_state = jax.tree_util.tree_map(lambda x: x * jnp.nan, solver_state)
        return self.Additions(solver_state=solver_state, active_solver_state=False)

    def _nan_reference(self):
        """NaN-filled reference ``PhysicalState`` (no tracking target)."""
        return self.PhysicalState(**{f.name: jnp.nan for f in fields(self.PhysicalState)})

    # ------------------------------------------------------------------
    # stochastic simulation (no reference equivalent — the reference is
    # deterministic everywhere; see ClassicODEEnvironment's
    # ``process_noise`` / ``observation_noise`` constructor args)
    # ------------------------------------------------------------------

    @property
    def _has_noise(self) -> bool:
        return bool(self._process_noise) or bool(self._observation_noise)

    @staticmethod
    def _validated_noise(noise: dict, valid_fields: tuple, what: str):
        if not noise:
            return None
        for name, sigma in noise.items():
            if name not in valid_fields:
                raise ValueError(
                    f"{what} field {name!r} is not one of {sorted(valid_fields)}"
                )
            if not (np.isscalar(sigma) and float(sigma) >= 0.0):
                raise ValueError(
                    f"{what}[{name!r}] must be a non-negative scalar std, got {sigma!r}"
                )
        return {k: float(v) for k, v in noise.items() if float(v) > 0.0} or None

    def _configure_noise(self, process_noise, observation_noise, noise_mode,
                         process_fields, observation_fields):
        """Validate and store the stochastic-simulation constructor args
        (shared by the classic envs and the PMSM)."""
        self._process_noise = self._validated_noise(
            process_noise, process_fields, "process_noise"
        )
        self._observation_noise = self._validated_noise(
            observation_noise, observation_fields, "observation_noise"
        )
        if noise_mode not in ("exact", "fast"):
            raise ValueError(
                f'noise_mode must be "exact" or "fast", got {noise_mode!r}'
            )
        self._noise_mode = noise_mode

    def _require_noise_key(self, state):
        """Trace-time check that ``state`` carries a usable per-instance PRNG
        key.  A default (rng-less) reset stores a NaN placeholder
        (``init_state``), which cannot drive noise draws."""
        key = state.PRNGKey
        is_typed_key = hasattr(key, "dtype") and jax.dtypes.issubdtype(
            key.dtype, jax.dtypes.prng_key
        )
        is_raw_key = (
            hasattr(key, "dtype")
            and jnp.issubdtype(key.dtype, jnp.unsignedinteger)
            and key.shape[-1:] == (2,)
        )
        if not (is_typed_key or is_raw_key):
            raise ValueError(
                "process/observation noise draws from the per-instance PRNG key in "
                "State.PRNGKey, but this state carries the NaN placeholder of a "
                "key-less reset — reset with "
                "env.vmap_reset(jax.random.split(key, env.batch_size))."
            )
        return key

    def _apply_process_noise(self, state, key, env_properties):
        """One Euler–Maruyama diffusion increment drawn from ``key``."""
        eps = jax.random.normal(key, (len(self._process_noise),))
        return self._apply_process_noise_eps(state, eps, env_properties)

    def _apply_process_noise_eps(self, state, eps, env_properties):
        """One Euler–Maruyama diffusion increment: ``x += sigma * sqrt(tau) * xi``
        per configured field (sigma in physical units per sqrt-second), with
        the standard-normal draws ``eps`` supplied by the caller (sorted-field
        order).  The drift was integrated by the configured solver over
        ``tau``, so for the default Euler this is exactly Euler–Maruyama; for
        higher-order solvers it is the standard splitting scheme (weak order 1
        in the noise).  Angle wrapping and post-step clipping re-apply to the
        perturbed state."""
        names = self._ode_state_fields
        items = sorted(self._process_noise.items())
        sqrt_tau = jnp.sqrt(self.tau)
        y = list(self._physical_to_y(state.physical_state))
        for j, (name, sigma) in enumerate(items):
            i = names.index(name)
            y[i] = y[i] + sigma * sqrt_tau * eps[j]
        y = self._clip_state(self._wrap_angles(tuple(y)))
        with structures.copy_and_mutate(state, validate=True) as new_state:
            for i, name in enumerate(names):
                setattr(new_state.physical_state, name, y[i])
        return new_state

    @property
    def _obs_noise_layout(self):
        """``(obs_column, field_name)`` pairs eligible for sensor noise.

        Default: the physical components at the head of the observation, in
        ``PhysicalState`` field order (every classic env's
        ``generate_observation`` layout).  Environments whose observation
        reorders or re-encodes physical components (e.g. the PMSM's
        cos/sin-encoded angle) override this with their own column map."""
        return tuple((i, f.name) for i, f in enumerate(fields(self.PhysicalState)))

    def _obs_noise_sigma_norm(self, env_properties):
        """Per-``_obs_noise_layout``-entry sensor std in normalized units
        (``2 * sigma / span``; leaf shapes follow the normalization leaves, so
        per-batch spans work).  Single source of the scaling arithmetic —
        shared by the per-step path below and the fused kernel's slab
        application (``ops/pallas/stepper.py::_apply_obs_noise_slab``)."""
        return tuple(
            (
                2.0
                * self._observation_noise[name]
                / (
                    getattr(env_properties.physical_normalizations, name).max
                    - getattr(env_properties.physical_normalizations, name).min
                )
            )
            if name in self._observation_noise
            else jnp.zeros(())
            for _col, name in self._obs_noise_layout
        )

    def _apply_observation_noise(self, obs, env_properties, key):
        """Additive Gaussian sensor noise drawn from ``key``."""
        eps = jax.random.normal(key, (len(self._obs_noise_layout),))
        return self._apply_observation_noise_eps(obs, env_properties, eps)

    def _apply_observation_noise_eps(self, obs, env_properties, eps):
        """Additive Gaussian sensor noise on the observed physical components
        (std in physical units, scaled into the normalized band through each
        field's normalization span — per-batch spans work), with the
        standard-normal draws ``eps`` (one per ``_obs_noise_layout`` entry)
        supplied by the caller.  Columns outside the layout (references,
        encodings, extras) are left exact."""
        sigmas = self._obs_noise_sigma_norm(env_properties)
        for k, (col, _name) in enumerate(self._obs_noise_layout):
            obs = obs.at[col].add(sigmas[k] * eps[k])
        return obs

    def _noise_slabs(self, keys0, n_steps: int, stride: int):
        """Whole-rollout noise draws for all ``batch_size`` instances.

        Single source of the per-rollout draw stream, shared by the scan
        (:meth:`vmap_rollout`) and the fused Pallas kernel
        (``ops/pallas/stepper.py::env_fused_rollout``) so the two paths stay
        draw-identical.

        Args:
            keys0: per-instance PRNG keys ``(batch_size,)`` (raw or typed).
            n_steps: rollout length T (static).
            stride: observation save stride (static, divides ``n_steps``);
                sensor draws are produced only at save positions.

        Returns:
            ``(eps_proc, eps_obs, keys_saves, final_keys)`` — standard-normal
            process draws ``(B, T, n_proc)`` (``None`` without process noise),
            sensor draws ``(B, S, n_phys)`` at the ``S = T // stride`` save
            positions (``None`` without observation noise), the state keys at
            each save position ``(B, S)``, and the final state keys ``(B,)``.

        Draw-stream semantics by ``_noise_mode``:

        * ``"exact"`` — the per-step ``split(key, 3)`` chain of :meth:`step`,
          evaluated as a sequential scan: stepping one-by-one, ``vmap_rollout``
          and the fused kernel all consume literally the same draws.  The
          chain is inherently sequential over time (~one threefry application
          per step regardless of batch), which bounds stochastic rollouts at
          the noise-generation roofline.
        * ``"fast"`` — counter-style keys derived from the rollout's starting
          key: step ``t`` draws from ``fold_in(fold_in(key, t), 0/1)``
          (process/sensor), and the state key after step ``t`` is
          ``fold_in(key, t + 1)``.  All T steps' draws are independent
          hashes of ``(key, t)`` and generate **time-parallel**.  Still fully
          deterministic per key, still independent across instances and
          therefore mesh-partition-invariant.  The trade-off: one T-step
          rollout and T chained :meth:`step` calls use *different (equally
          valid) draw streams* — :meth:`step` realizes the T=1 rollout, so
          chaining re-derives step 0 of a fresh stream from each new key —
          mirroring the documented step/sim_ahead divergence contract.
        """
        if n_steps % stride:
            raise ValueError("n_steps must be divisible by obs_stride")
        proc_items = sorted(self._process_noise.items()) if self._process_noise else []
        want_obs = bool(self._observation_noise)
        n_p = len(proc_items)
        n_phys = len(self._obs_noise_layout)
        n_segs = n_steps // stride

        if self._noise_mode == "fast":
            fold = jax.random.fold_in

            if proc_items:
                t_idx = jnp.arange(n_steps)
                eps_proc = jax.vmap(
                    lambda k: jax.vmap(
                        lambda t: jax.random.normal(fold(fold(k, t), 0), (n_p,))
                    )(t_idx)
                )(keys0)
            else:
                eps_proc = None
            save_t = jnp.arange(1, n_segs + 1) * stride - 1  # last step of each segment
            if want_obs:
                eps_obs = jax.vmap(
                    lambda k: jax.vmap(
                        lambda t: jax.random.normal(fold(fold(k, t), 1), (n_phys,))
                    )(save_t)
                )(keys0)
            else:
                eps_obs = None
            keys_saves = jax.vmap(lambda k: jax.vmap(lambda t: fold(k, t + 1))(save_t))(keys0)
            final_keys = keys_saves[:, -1]  # == fold_in(keys0, n_steps)
            return eps_proc, eps_obs, keys_saves, final_keys

        def _inner(key, _):
            new_key, k_proc, k_obs = jax.random.split(key, 3)
            eps_p = (
                jax.random.normal(k_proc, (n_p,)) if proc_items else jnp.zeros((0,))
            )
            return new_key, (eps_p, k_obs)

        def _outer(key, _):
            key, (eps_p_seg, k_obs_seg) = jax.lax.scan(_inner, key, None, length=stride)
            # sensor draws only at SAVE positions: the key chain advances via
            # split alone, so skipping the unneeded per-step normal() calls
            # is draw-exact vs the scan path while shrinking the slab from
            # (B, T, n_phys) to (B, n_saves, n_phys)
            eps_o = (
                jax.random.normal(k_obs_seg[-1], (n_phys,))
                if want_obs
                else jnp.zeros((0,))
            )
            # the carry here IS the state key after the segment's last step
            return key, (eps_p_seg, eps_o, key)

        final_keys, (eps_proc, eps_obs, keys_saves) = jax.vmap(
            lambda k: jax.lax.scan(_outer, k, None, length=n_segs)
        )(keys0)
        eps_proc = (
            eps_proc.reshape(self.batch_size, n_steps, n_p) if proc_items else None
        )
        if not want_obs:
            eps_obs = None
        return eps_proc, eps_obs, keys_saves, final_keys

    # ------------------------------------------------------------------
    # reset / step / sim_ahead (reference core_env.py:361-531)
    # ------------------------------------------------------------------

    def reset(self, env_properties, rng=None, initial_state=None, vmap_helper=None):
        """Reset to the default, a random, or a caller-provided initial state."""
        if initial_state is not None:
            assert tree_structure(self.init_state(env_properties)) == tree_structure(
                initial_state
            ), "initial_state should have the same dataclass structure as init_state()"
            state = initial_state
        else:
            state = self.init_state(env_properties, rng)
        obs = self.generate_observation(state, env_properties)
        return obs, state

    def _noise_step_keys(self, base):
        """``(new_key, k_proc, k_obs)`` for one control step, per
        ``_noise_mode`` — the single source of the per-step key derivation
        (consumed by :meth:`step` and the PMSM's step override)."""
        if self._noise_mode == "fast":
            # counter-style stream: step() realizes the T=1 rollout of
            # _noise_slabs' fast mode (fold_in(key, t) per-step keys)
            k_step = jax.random.fold_in(base, 0)
            return (
                jax.random.fold_in(base, 1),
                jax.random.fold_in(k_step, 0),
                jax.random.fold_in(k_step, 1),
            )
        new_key, k_proc, k_obs = jax.random.split(base, 3)
        return new_key, k_proc, k_obs

    def _fast_noise_advance_eps(self, state, action_norm, env_properties, eps_p):
        """One deterministic advance + caller-supplied process draws — the
        state half of a fast-mode slab-consuming step (shared by
        :meth:`_vmap_rollout_fast_noise` and the collector's fast-mode scan
        so their draw sequences stay provably identical)."""
        state = self._advance_state(state, action_norm, env_properties)
        if self._process_noise:
            state = self._apply_process_noise_eps(state, eps_p, env_properties)
        return state

    def _fast_noise_observe_eps(self, state, env_properties, eps_o):
        """Observation + caller-supplied sensor draws — the observation half
        of a fast-mode slab-consuming step."""
        obs = self.generate_observation(state, env_properties)
        if self._observation_noise:
            obs = self._apply_observation_noise_eps(obs, env_properties, eps_o)
        return obs

    def _state_from_normalized_physical(self, x_norm, env_properties, ref_norm=None):
        """Single-instance :class:`State` whose physical fields take the given
        normalized values ``x_norm`` (``PhysicalState`` field order), with an
        inactive solver carry and a placeholder PRNG key.  ``ref_norm``
        optionally supplies the normalized ``control_state`` reference
        columns (NaN otherwise).

        This is the physical-fields inverse of :meth:`normalize_state` — the
        observers (EKF/UKF) and the output-feedback loop use it to rebuild a
        steppable state from a belief vector.  The default routes through
        :meth:`generate_state_from_observation` (valid for the classic
        head-ordered observation layout); environments whose observation
        re-encodes fields (PMSM) override it to build the state directly."""
        x_norm = jnp.asarray(x_norm)
        n_ref = len(self.control_state)
        if ref_norm is None:
            ref_cols = jnp.full((n_ref,), jnp.nan, x_norm.dtype)
        else:
            ref_cols = jnp.asarray(ref_norm)
        obs = jnp.concatenate([x_norm, ref_cols])
        return self.generate_state_from_observation(obs, env_properties)

    #: optional STATE-INDEPENDENT physical-action constraint (actuator
    #: realism: inverter voltage-vector limits, current clamps).  When set,
    #: it is a callable ``(action_components_tuple) -> tuple`` of
    #: shape-polymorphic elementwise math (closing over env attributes for
    #: its constants), applied after denormalization on EVERY path — step,
    #: sim_ahead, reward evaluation, adaptive, the fused open-loop slabs and
    #: the closed-loop kernels — so the scan and kernel semantics can never
    #: diverge.  State-DEPENDENT constraints (the PMSM's angle-advanced
    #: hexagon) need the full override machinery instead.
    _constrain_action_tuple = None

    def _constrained_phys_action(self, action):
        """Apply :attr:`_constrain_action_tuple` to a physical action whose
        LAST axis is the action dimension (shape-polymorphic: ``(A,)``
        vectors, ``(T, A)`` sequences, ``(B, T, A)`` slabs)."""
        hook = self._constrain_action_tuple
        if hook is None:
            return action
        comps = hook(tuple(action[..., i] for i in range(self.action_dim)))
        return jnp.stack(comps, axis=-1)

    def _advance_state(self, state, action_norm, env_properties):
        """The deterministic state update of one control step: denormalize the
        action and integrate one ``tau`` interval.  Environments with extra
        per-step actuation semantics (e.g. the PMSM's inverter constraint and
        deadtime buffer) override this — it is the single hook through which
        :meth:`step`, the fast-noise rollout scan and the fast-noise collector
        advance the state, so the stochastic machinery composes with any
        step override."""
        action = self.denormalize_action(action_norm, env_properties)
        action = self._constrained_phys_action(action)
        return self._ode_solver_step(state, action, env_properties.static_params)

    @partial(jax.jit, static_argnums=0)
    def step(self, state, action_norm, env_properties):
        """One control step for a single environment instance.

        Returns ``(observation, next_state)``; actions arrive normalized in
        [-1, 1] and are denormalized internally (reference ``core_env.py:393-425``).
        """
        assert action_norm.shape == (self.action_dim,), (
            "The action needs to be of shape (action_dim,) which is "
            f"{(self.action_dim,)}, but {action_norm.shape} is given"
        )
        physical_state_shape = jnp.array(tree_flatten(state.physical_state)[0]).T.shape
        assert physical_state_shape == (self.physical_state_dim,), (
            "The physical state needs to be of shape (physical_state_dim,) which is "
            f"{(self.physical_state_dim,)}, but {physical_state_shape} is given"
        )

        if self._has_noise:
            new_key, k_proc, k_obs = self._noise_step_keys(self._require_noise_key(state))
            state = structures.replace(state, PRNGKey=new_key)

        state = self._advance_state(state, action_norm, env_properties)
        if self._process_noise:
            state = self._apply_process_noise(state, k_proc, env_properties)
        obs = self.generate_observation(state, env_properties)
        if self._observation_noise:
            obs = self._apply_observation_noise(obs, env_properties, k_obs)
        return obs, state

    @partial(jax.jit, static_argnums=[0, 4, 5])
    def sim_ahead(self, init_state, actions, env_properties, obs_stepsize, action_stepsize):
        """Integrate a whole action sequence for one instance.

        Actions are zero-order-hold interpolated; total simulated time is
        ``actions.shape[0] * action_stepsize``.

        Warning:
            For multistage solvers intermediate stages may access actions at
            future time steps, so ``sim_ahead`` is not guaranteed to be
            numerically equivalent to repeated ``step`` calls (reference
            ``core_env.py:435-439``) — equality holds for Euler.

        Returns ``(observations, states, last_state)``.

        Stochastic envs (``process_noise``/``observation_noise``) integrate
        as an SDE for ONE-STAGE solvers (the Euler default): the drift step
        on the observation grid is followed by an Euler–Maruyama increment
        ``sigma * sqrt(obs_stepsize) * xi`` per configured field, and each
        saved observation carries its own sensor draw — at ``obs_stepsize ==
        action_stepsize`` this consumes the same per-step key chain as
        repeated :meth:`step` calls.  Multistage solvers raise: their
        intermediate stages have no agreed stochastic semantics (the
        Itô–Taylor expansion behind an RK tableau does not commute with
        additive noise beyond weak order 1), so silently integrating the
        drift at high order under order-0.5 noise would misrepresent the
        result.
        """
        if self._has_noise:
            from exciting_environments_tpu.ops.solvers import ExplicitRungeKutta

            if not (
                isinstance(self._solver, ExplicitRungeKutta)
                and self._solver.one_stage
            ):
                raise ValueError(
                    "stochastic sim_ahead is defined for one-stage solvers "
                    "only (Euler–Maruyama on the observation grid); multistage "
                    "tableaus have no agreed SDE semantics — integrate with "
                    'solver="euler" or step through vmap_step / vmap_rollout.'
                )
        assert actions.ndim == 2, "The actions need to have two dimensions: (n_action_steps, action_dim)"
        assert actions.shape[-1] == self.action_dim, (
            f"The last dimension does not correspond to the action dim which is "
            f"{self.action_dim}, but {actions.shape[-1]} is given"
        )
        init_physical_state_shape = jnp.array(tree_flatten(init_state.physical_state)[0]).T.shape
        assert init_physical_state_shape == (self.physical_state_dim,), (
            "The initial physical state needs to be of shape (env.physical_state_dim,) which is "
            f"{(self.physical_state_dim,)}, but {init_physical_state_shape} is given"
        )

        actions = jax.vmap(self.denormalize_action, in_axes=(0, None))(actions, env_properties)
        actions = self._constrained_phys_action(actions)

        if self._has_noise:
            states, eps_obs = self._sde_simulate_ahead(
                init_state, actions, env_properties, obs_stepsize, action_stepsize
            )
        else:
            states = self._ode_solver_simulate_ahead(
                init_state, actions, env_properties.static_params, obs_stepsize, action_stepsize
            )
            eps_obs = None
        observations = jax.vmap(self.generate_observation, in_axes=(0, None))(states, env_properties)
        if eps_obs is not None and self._observation_noise:
            # each post-step save carries its own step's sensor draw; the
            # initial row is the exact state (no draw consumed yet)
            noisy_tail = jax.vmap(
                self._apply_observation_noise_eps, in_axes=(0, None, 0)
            )(observations[1:], env_properties, eps_obs)
            observations = jnp.concatenate([observations[:1], noisy_tail], axis=0)

        # per-leaf time indexing preserves the single-state tree structure
        last_state = self._index_time(states, -1)
        return observations, states, last_state

    def _sde_simulate_ahead(self, init_state, actions, env_properties, obs_stepsize, action_stepsize):
        """Euler–Maruyama trajectory solve on the observation grid (the
        stochastic counterpart of :meth:`_ode_solver_simulate_ahead`,
        one-stage solvers only).

        Per observation step: the exact one-stage drift update ``y + dt *
        f`` (the ``b == (1.0,)`` invariant of ``solvers._weighted_increment``)
        under the ZOH action, then the diffusion increment ``sigma *
        sqrt(dt) * xi`` on the raw (unwrapped, sim-ahead-contract) carry;
        keys advance via :meth:`_noise_step_keys`, so at ``obs_stepsize ==
        action_stepsize`` the draw stream equals chained :meth:`step` calls
        in BOTH noise modes.  Saves are wrapped/clipped like the
        deterministic path and each save carries ITS step's advanced key —
        resuming from a saved state must not replay consumed draws.
        Returns ``(states, eps_obs)`` with ``eps_obs`` the per-post-step-save
        standard-normal sensor draws ``(n_steps, n_layout)``.
        """
        from exciting_environments_tpu.ops.rollout import zoh_action

        f = self._vector_field(zoh_action(actions, action_stepsize))
        y0 = self._physical_to_y(init_state.physical_state)
        args = env_properties.static_params
        t1 = action_stepsize * actions.shape[0]
        n_steps = int(t1 / obs_stepsize)
        dt = obs_stepsize
        key0 = self._require_noise_key(init_state)

        proc_items = sorted(self._process_noise.items()) if self._process_noise else []
        idxs = tuple(self._ode_state_fields.index(nm) for nm, _ in proc_items)
        sqrt_dt = jnp.sqrt(dt)
        n_layout = len(self._obs_noise_layout)
        want_obs = bool(self._observation_noise)

        def body(carry, t):
            y, key = carry
            new_key, k_p, k_o = self._noise_step_keys(key)
            dy = f(t, y, args)
            y1 = tuple(yl + dt * dyl for yl, dyl in zip(y, dy))
            if proc_items:
                eps = jax.random.normal(k_p, (len(proc_items),))
                y1 = list(y1)
                for j, i in enumerate(idxs):
                    y1[i] = y1[i] + proc_items[j][1] * sqrt_dt * eps[j]
                y1 = tuple(y1)
            eps_o = (
                jax.random.normal(k_o, (n_layout,)) if want_obs else jnp.zeros((0,))
            )
            return (y1, new_key), (y1, new_key, eps_o)

        # host-side f64 step-start times, like ops/rollout.py::solve_trajectory:
        # an on-device fl32(i * fl32(dt)) grid adds a systematic dt-rounding to
        # every ZOH index computation, which consumes zoh_action's floor-guard
        # margin over long horizons
        ts = jnp.asarray(np.arange(n_steps, dtype=np.float64) * dt)
        (_, _key_last), (ys_tail, keys_tail, eps_obs) = jax.lax.scan(
            body, (y0, key0), ts
        )
        ys = tuple(
            jnp.concatenate([jnp.asarray(l0)[None], tail], axis=0)
            for l0, tail in zip(y0, ys_tail)
        )
        ys = self._wrap_angles(ys)
        ys = self._clip_state(ys)
        obs_len = n_steps + 1

        physical_states = self.PhysicalState(**dict(zip(self._ode_state_fields, ys)))
        reference = self.PhysicalState(
            **{
                field.name: jnp.full(obs_len, getattr(init_state.reference, field.name))
                for field in fields(self.PhysicalState)
            }
        )
        y_last = tuple(leaf[-1] for leaf in ys)
        solver_state = self._solver.init(f, t1, t1 + self.tau, y_last, args)
        additions = self.Additions(
            solver_state=self.repeat_values(solver_state, obs_len),
            active_solver_state=jnp.full(obs_len, True),
        )
        keys = jnp.concatenate([jnp.asarray(key0)[None], keys_tail], axis=0)
        states = self.State(
            physical_state=physical_states,
            PRNGKey=keys,
            additions=additions,
            reference=reference,
        )
        return states, eps_obs

    @partial(jax.jit, static_argnums=0)
    def generate_rew_trunc_term_ahead(self, states, actions, env_properties):
        """Rewards/truncated/terminated flags for a ``sim_ahead`` trajectory
        (reference ``core_env.py:490-531``)."""
        assert actions.ndim == 2, "The actions need to have two dimensions: (n_action_steps, action_dim)"
        assert actions.shape[-1] == self.action_dim, (
            f"The last dimension does not correspond to the action dim which is "
            f"{self.action_dim}, but {actions.shape[-1]} is given"
        )
        actions = jax.vmap(self.denormalize_action, in_axes=(0, None))(actions, env_properties)
        actions = self._constrained_phys_action(actions)

        obs_len = jax.tree_util.tree_leaves(states)[0].shape[0]
        states_without_init_state = self._index_time(states, slice(1, None))

        # axis=0 keeps (n, A) rows intact — bit-identical to the reference's
        # flatten-then-expand for A == 1 (core_env.py:519) and correct,
        # rather than interleaved, for multi-dimensional actions
        reward = jax.vmap(self.generate_reward, in_axes=(0, 0, None))(
            states_without_init_state,
            jnp.repeat(actions, int((obs_len - 1) / actions.shape[0]), axis=0),
            env_properties,
        )
        truncated = jax.vmap(self.generate_truncated, in_axes=(0, None))(states, env_properties)
        terminated = jax.vmap(self.generate_terminated, in_axes=(0, 0, None))(
            states_without_init_state, reward, env_properties
        )
        return reward, truncated, terminated

    # ------------------------------------------------------------------
    # batched API (reference core_env.py:533-705)
    # ------------------------------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def vmap_step(self, state, action):
        """One control step for all ``batch_size`` instances."""
        assert action.shape == (self.batch_size, self.action_dim), (
            "The action needs to be of shape (batch_size, action_dim) which is "
            f"{(self.batch_size, self.action_dim)}, but {action.shape} is given"
        )
        physical_state_shape = jnp.array(tree_flatten(state.physical_state)[0]).T.shape
        assert physical_state_shape == (self.batch_size, self.physical_state_dim), (
            "The physical state needs to be of shape (batch_size, physical_state_dim) which is "
            f"{(self.batch_size, self.physical_state_dim)}, but {physical_state_shape} is given"
        )
        obs, state = jax.vmap(self.step, in_axes=(0, 0, self.in_axes_env_properties))(
            state, action, self.env_properties
        )
        return obs, state

    @partial(jax.jit, static_argnums=[0, 3, 4])
    def vmap_sim_ahead(self, init_state, actions, obs_stepsize, action_stepsize):
        """Trajectory integration for all batches (actions shape
        ``(batch_size, n_action_steps, action_dim)``)."""
        assert obs_stepsize <= action_stepsize, (
            "The action stepsize should be greater or equal to the observation stepsize."
        )
        assert actions.ndim == 3, (
            "The actions need to have three dimensions: (batch_size, n_action_steps, action_dim)"
        )
        assert actions.shape[0] == self.batch_size, (
            f"The first dimension does not correspond to the batch size which is "
            f"{self.batch_size}, but {actions.shape[0]} is given"
        )
        assert actions.shape[-1] == self.action_dim, (
            f"The last dimension does not correspond to the action dim which is "
            f"{self.action_dim}, but {actions.shape[-1]} is given"
        )
        init_physical_state_shape = jnp.array(tree_flatten(init_state.physical_state)[0]).T.shape
        assert init_physical_state_shape == (self.batch_size, self.physical_state_dim), (
            "The initial physical state needs to be of shape (batch_size, physical_state_dim,) which is "
            f"{(self.batch_size, self.physical_state_dim)}, but {init_physical_state_shape} is given"
        )
        observations, states, last_state = jax.vmap(
            self.sim_ahead, in_axes=(0, 0, self.in_axes_env_properties, None, None)
        )(init_state, actions, self.env_properties, obs_stepsize, action_stepsize)
        return observations, states, last_state

    @partial(jax.jit, static_argnums=[0, 3])
    def vmap_rollout(self, init_state, actions, obs_stride: int = 1):
        """TPU-native multi-step batched rollout (no reference equivalent).

        The reference forces the control loop into user-side Python — one
        device dispatch per ``vmap_step`` call (``README.md:28-31``).  This
        method runs the whole action sequence inside a single jitted
        ``lax.scan``: state stays on-chip for the entire horizon and only the
        sampled observations are materialized, which removes per-step dispatch
        overhead entirely and is the intended hot path for RL data generation.

        Unlike :meth:`vmap_sim_ahead` (trajectory ODE solve with frozen
        solver-time semantics), this is exactly a fused loop of
        :meth:`vmap_step` — identical numerics to stepping manually.

        Args:
            init_state: batched initial state (from :meth:`vmap_reset`).
            actions: normalized actions, shape ``(batch_size, n_steps, action_dim)``.
            obs_stride: keep every ``obs_stride``-th observation (static).
                ``n_steps`` must be divisible by it.

        Returns:
            ``(observations, final_state)`` with observations of shape
            ``(batch_size, n_steps // obs_stride, obs_dim)``.
        """
        assert actions.ndim == 3 and actions.shape[0] == self.batch_size and actions.shape[2] == self.action_dim, (
            "The actions need shape (batch_size, n_steps, action_dim) = "
            f"{(self.batch_size, 'T', self.action_dim)}, but {actions.shape} is given"
        )
        n_steps = actions.shape[1]
        assert n_steps % obs_stride == 0, "n_steps must be divisible by obs_stride"

        if self._has_noise and self._noise_mode == "fast":
            return self._vmap_rollout_fast_noise(init_state, actions, obs_stride)

        step_batch = jax.vmap(self.step, in_axes=(0, 0, self.in_axes_env_properties))
        actions_tm = jnp.swapaxes(actions, 0, 1)  # time-major for scan

        if obs_stride == 1:
            def body(state, action_t):
                obs, state = step_batch(state, action_t, self.env_properties)
                return state, obs

            final_state, obs = jax.lax.scan(body, init_state, actions_tm)
        else:
            # nested scan: inner loop advances `obs_stride` steps on-chip and
            # only the last observation of each chunk is materialized
            chunked = actions_tm.reshape(n_steps // obs_stride, obs_stride, *actions_tm.shape[1:])

            def inner(carry, action_t):
                state, _ = carry
                obs, state = step_batch(state, action_t, self.env_properties)
                return (state, obs), None

            def body(state, action_chunk):
                obs0, state = step_batch(state, action_chunk[0], self.env_properties)
                (state, obs), _ = jax.lax.scan(inner, (state, obs0), action_chunk[1:])
                return state, obs

            final_state, obs = jax.lax.scan(body, init_state, chunked)

        return jnp.swapaxes(obs, 0, 1), final_state

    def _vmap_rollout_fast_noise(self, init_state, actions, obs_stride: int):
        """:meth:`vmap_rollout` body for ``noise_mode="fast"``: the whole
        rollout's draws generate time-parallel upfront (:meth:`_noise_slabs`)
        and a slab-consuming scan applies them — draw-identical to the fused
        kernel's fast-mode stream, so kernel-vs-scan parity holds in fast mode
        exactly as it does in exact mode."""
        n_steps = actions.shape[1]
        keys0 = self._require_noise_key(init_state)
        eps_proc, eps_obs, keys_saves, final_keys = self._noise_slabs(
            keys0, n_steps, obs_stride
        )
        del keys_saves  # per-save keys are a fused-kernel (traj-states) concern
        in_ax = self.in_axes_env_properties
        props = self.env_properties
        has_proc = eps_proc is not None
        has_obs = eps_obs is not None

        step_b = jax.vmap(self._fast_noise_advance_eps, in_axes=(0, 0, in_ax, 0))
        obs_b = jax.vmap(self._fast_noise_observe_eps, in_axes=(0, in_ax, 0))
        one_step = lambda state, a_t, ep_t: step_b(state, a_t, props, ep_t)
        obs_of = lambda state, eo_s: obs_b(state, props, eo_s)

        n_segs = n_steps // obs_stride
        acts_tm = jnp.swapaxes(actions, 0, 1)
        a_ch = acts_tm.reshape(n_segs, obs_stride, self.batch_size, self.action_dim)
        ep = (
            jnp.swapaxes(eps_proc, 0, 1)
            if has_proc
            else jnp.zeros((n_steps, self.batch_size, 0))
        )
        ep_ch = ep.reshape(n_segs, obs_stride, self.batch_size, ep.shape[-1])
        eo = (
            jnp.swapaxes(eps_obs, 0, 1)
            if has_obs
            else jnp.zeros((n_segs, self.batch_size, 0))
        )

        def seg(state, xs):
            a_c, ep_c, eo_s = xs

            def inner(s, x):
                return one_step(s, x[0], x[1]), None

            state, _ = jax.lax.scan(inner, state, (a_c, ep_c))
            return state, obs_of(state, eo_s)

        final_state, obs = jax.lax.scan(seg, init_state, (a_ch, ep_ch, eo))
        final_state = structures.replace(final_state, PRNGKey=final_keys)
        return jnp.swapaxes(obs, 0, 1), final_state

    def fused_rollout(self, init_state, actions, obs_stride: int = None,
                      time_major: bool = False, interpret: bool = False,
                      strict: bool = False):
        """:meth:`vmap_rollout` through the fused Pallas kernel when the
        environment is in kernel scope (state resident in VMEM for the whole
        horizon; see :mod:`exciting_environments_tpu.ops.pallas.stepper`),
        transparently falling back to the scan otherwise (``strict=True``
        raises instead; probe ahead with
        :func:`exciting_environments_tpu.ops.pallas.rollout_path`).  Returns
        ``(obs, final_state)`` with ``obs`` of shape ``(B, obs_dim)`` — or
        ``(B, n_steps // obs_stride, obs_dim)`` with ``obs_stride`` set.
        Differentiable (checkpointed-recompute VJP).  Environments with
        their own kernel (PMSM) override this."""
        from exciting_environments_tpu.ops.pallas.stepper import env_fused_rollout

        return env_fused_rollout(
            self, init_state, actions,
            obs_stride=obs_stride, time_major=time_major, interpret=interpret,
            strict=strict,
        )

    def fused_sim_ahead(self, init_state, actions, obs_stepsize, action_stepsize,
                        obs_stride: int = 1, time_major: bool = False,
                        interpret: bool = False, strict: bool = False):
        """:meth:`vmap_sim_ahead` semantics through the fused trajectory
        kernel for any integral ``action_stepsize / obs_stepsize`` ratio
        (scan fallback otherwise, ``strict=True`` raises); returns
        ``(observations, last_state)``.  Differentiable."""
        from exciting_environments_tpu.ops.pallas.stepper import env_fused_sim_ahead

        return env_fused_sim_ahead(
            self, init_state, actions, obs_stepsize, action_stepsize,
            obs_stride=obs_stride, time_major=time_major, interpret=interpret,
            strict=strict,
        )

    def fused_closed_loop(self, init_state, policy, n_steps: int,
                          obs_stride: int = None, interpret: bool = False,
                          policy_params=None, return_traj_states: bool = False,
                          policy_carry=None):
        """Closed-loop rollout with the policy evaluated INSIDE the fused
        Pallas kernel on (rows, 128) tiles — the whole observation -> action
        -> step loop VMEM-resident, zero action traffic (see
        :func:`exciting_environments_tpu.ops.pallas.stepper.env_fused_closed_loop`
        for the policy contract).  ``policy_carry`` (tuple of ``(B,)`` float
        leaves) makes the policy STATEFUL — ``policy(obs, step, carry[,
        params]) -> (action, carry)`` with the carry VMEM-resident between
        steps (PI/PID laws, filters, recurrent policies at kernel speed);
        every return shape then gains the final carry as its last element.
        Raises out of kernel scope (a closed loop has no open-loop fallback;
        use ``RolloutCollector.collect_policy`` there)."""
        from exciting_environments_tpu.ops.pallas.stepper import env_fused_closed_loop

        return env_fused_closed_loop(
            self, init_state, policy, n_steps,
            obs_stride=obs_stride, interpret=interpret,
            policy_params=policy_params, return_traj_states=return_traj_states,
            policy_carry=policy_carry,
        )

    @partial(jax.jit, static_argnums=0)
    def vmap_generate_rew_trunc_term_ahead(self, states, actions):
        """Batched :meth:`generate_rew_trunc_term_ahead`."""
        assert actions.ndim == 3, (
            "The actions need to have three dimensions: (batch_size, n_action_steps, action_dim)"
        )
        assert actions.shape[0] == self.batch_size, (
            f"The first dimension does not correspond to the batch size which is "
            f"{self.batch_size}, but {actions.shape[0]} is given"
        )
        assert actions.shape[-1] == self.action_dim, (
            f"The last dimension does not correspond to the action dim which is "
            f"{self.action_dim}, but {actions.shape[-1]} is given"
        )
        reward, truncated, terminated = jax.vmap(
            self.generate_rew_trunc_term_ahead,
            in_axes=(0, 0, self.in_axes_env_properties),
        )(states, actions, self.env_properties)
        return reward, truncated, terminated

    @partial(jax.jit, static_argnums=0)
    def vmap_init_state(self, rng=None):
        """Default or random initial state for all batches."""
        return jax.vmap(self.init_state, in_axes=(self.in_axes_env_properties, 0, 0))(
            self.env_properties, rng, jnp.ones(self.batch_size)
        )

    @partial(jax.jit, static_argnums=0)
    def vmap_reset(self, rng=None, initial_state=None):
        """Batched :meth:`reset`."""
        if initial_state is not None:
            assert tree_structure(self.vmap_init_state()) == tree_structure(
                initial_state
            ), "initial_state should have the same dataclass structure as self.vmap_init_state()"
        obs, state = jax.vmap(
            self.reset,
            in_axes=(self.in_axes_env_properties, 0, 0, 0),
        )(self.env_properties, rng, initial_state, jnp.ones(self.batch_size))
        return obs, state

    @partial(jax.jit, static_argnums=0)
    def vmap_generate_state_from_observation(self, obs, key=None):
        """Batched observation -> state reconstruction."""
        state = jax.vmap(
            self.generate_state_from_observation,
            in_axes=(0, self.in_axes_env_properties, 0),
        )(obs, self.env_properties, key)
        return state

    # ------------------------------------------------------------------
    # abstract observation/reward hooks
    # ------------------------------------------------------------------

    def init_state(self, env_properties, rng=None, vmap_helper=None):
        raise NotImplementedError

    def generate_observation(self, state, env_properties):
        raise NotImplementedError

    def generate_state_from_observation(self, obs, env_properties, key=None):
        raise NotImplementedError

    def generate_reward(self, state, action, env_properties):
        raise NotImplementedError

    def generate_truncated(self, state, env_properties):
        raise NotImplementedError

    def generate_terminated(self, state, reward, env_properties):
        raise NotImplementedError
