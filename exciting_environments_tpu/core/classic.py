"""Shared implementation layer for the classical ODE environments.

The reference implements each of its hand-written physics environments
(pendulum, cart_pole, acrobot, mass_spring_damper, fluid_tank) as ~400-500
line classes that repeat the same construction, reset, observation,
reward and soft-constraint scaffolding (compare
``/root/reference/exciting_environments/pendulum/pendulum_env.py:261-390`` with
``cart_pole/cart_pole_env.py:314-453`` — near-identical code).  In this
TPU-native re-design the scaffolding lives once in
:class:`ClassicODEEnvironment`; a concrete environment only declares

* its nested state/param dataclasses,
* default normalizations / static parameters / ``tau``,
* the vector field ``_ode``, and
* small metadata: which fields are angles, which are soft-constrained,
  which use a sin/cos distance in tracking rewards.

Semantics are kept behavior-identical to the reference (same normalized
observation layout, same reward shape ``(1,)``, same ``truncated``/
``terminated`` rules, same NaN-reference convention).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
from dataclasses import fields

from exciting_environments_tpu.core import structures
from exciting_environments_tpu.core.env import CoreEnvironment
from exciting_environments_tpu.utils import MinMaxNormalization


class ClassicODEEnvironment(CoreEnvironment):
    """Base class for the hand-written physics models.

    Subclasses set the class attributes below; see
    :class:`exciting_environments_tpu.models.pendulum.Pendulum` for the
    smallest complete example.
    """

    #: default number of parallel instances
    _default_batch_size: int = 8
    #: default control-step duration in seconds
    _default_tau: float = 1e-4
    #: lower bound of the uniform normalized random reset draw
    #: (the fluid tank draws from [0, 1], everything else from [-1, 1])
    _init_uniform_minval: float = -1.0
    #: fields whose tracking error uses the sin/cos distance (angles)
    _sincos_reward_fields: tuple = ()
    #: fields receiving a |x|>1 ReLU soft constraint by default
    _soft_constrained_fields: tuple = ()
    #: normalized default initial values per physical-state field
    _default_init_norm: dict = {}

    # -- per-env defaults; return fresh containers so instances never alias --

    @classmethod
    def _default_physical_normalizations(cls) -> dict:
        raise NotImplementedError

    @classmethod
    def _default_action_normalizations(cls) -> dict:
        raise NotImplementedError

    @classmethod
    def _default_static_params(cls) -> dict:
        raise NotImplementedError

    def __init__(
        self,
        batch_size: int = None,
        physical_normalizations: dict = None,
        action_normalizations: dict = None,
        soft_constraints: Callable = None,
        static_params: dict = None,
        control_state: list = None,
        solver=None,
        tau: float = None,
        fast_math: bool = False,
        process_noise: dict = None,
        observation_noise: dict = None,
        noise_mode: str = "exact",
    ):
        """
        Args:
            batch_size: Number of parallel environment simulations.
            physical_normalizations: Min/max values of each physical-state
                component for normalization (dict of
                :class:`~exciting_environments_tpu.utils.MinMaxNormalization`).
            action_normalizations: Min/max values of each action component.
            soft_constraints: Function returning soft-constraint values for
                state and/or action.
            static_params: Parameters of the environment that do not change
                during simulation.
            control_state: Physical-state components considered in reference
                tracking.
            solver: ODE solver instance or registry name (default Euler).
            tau: Duration of one control step in seconds.
            fast_math: Replace ``sin``/``cos`` and the angle wrap in the
                dynamics with FMA-only polynomial equivalents
                (:mod:`exciting_environments_tpu.ops.fastmath`; ~2e-7 max
                error per evaluation).  Opt-in: golden-fixture parity
                requires the default exact ops.
            process_noise: Optional ``{field: sigma}`` additive diffusion on
                integrated physical-state fields (sigma in physical units per
                sqrt-second, scalar): each control step adds one
                Euler–Maruyama increment ``sigma * sqrt(tau) * N(0, 1)``
                drawn from the per-instance key in ``State.PRNGKey`` (reset
                with ``vmap_reset(jax.random.split(key, batch_size))``).
                Turns the env into an SDE simulator for robustness training
                and estimator stress-testing; the stochastic paths are
                ``step`` / ``vmap_step`` / ``vmap_rollout`` (and everything
                built on them: RL, MPC, wrappers, collectors), the fused
                step-mode/closed-loop kernels (draw-identical streamed
                slabs), and — for one-stage solvers — ``sim_ahead`` as an
                Euler–Maruyama trajectory solve on the observation grid;
                multistage ``sim_ahead`` and ``adaptive_rollout`` are
                deterministic solvers and raise.
            observation_noise: Optional ``{field: sigma}`` Gaussian sensor
                noise on the observed physical components (sigma in physical
                units, scalar; scaled into the normalized band through the
                field's normalization span).  Same key/path semantics as
                ``process_noise``; the underlying state stays exact.
            noise_mode: Draw-stream generation for the stochastic paths.
                ``"exact"`` (default) chains ``split(key, 3)`` per step —
                step-by-step loops, ``vmap_rollout`` and the fused kernel
                all consume literally the same draws, but generation is
                inherently sequential over time (the noise roofline for
                whole-horizon rollouts).  ``"fast"`` derives each step's
                draws counter-style from the rollout's starting key
                (``fold_in(key, t)``): whole-rollout noise generates
                time-parallel at kernel-class speed, still deterministic
                per key, independent across the batch and mesh-partition-
                invariant; scan and fused rollouts stay draw-identical to
                each other, but one T-step rollout and T chained ``step``
                calls use different (equally valid) streams — see
                ``CoreEnvironment._noise_slabs``.

        Note: attributes of ``MinMaxNormalization`` and ``static_params``
        values may also be ``(batch_size,)`` arrays to set per-batch values
        (reference heterogeneous batching, ``core_env.py:268-272``).
        """
        from exciting_environments_tpu.ops import fastmath

        self.fast_math = bool(fast_math)
        if self.fast_math:
            self._sin = fastmath.sin_wrapped
            self._cos = fastmath.poly_cos
            self._sign = fastmath.fast_sign
        else:
            self._sin = jnp.sin
            self._cos = jnp.cos
            self._sign = jnp.sign

        if batch_size is None:
            batch_size = self._default_batch_size
        if tau is None:
            tau = self._default_tau
        if not physical_normalizations:
            physical_normalizations = self._default_physical_normalizations()
        if not action_normalizations:
            action_normalizations = self._default_action_normalizations()
        if not static_params:
            static_params = self._default_static_params()
        if not soft_constraints:
            soft_constraints = self.default_soft_constraints
        if not control_state:
            control_state = []

        self.control_state = control_state
        self.soft_constraints = soft_constraints
        self._configure_noise(
            process_noise,
            observation_noise,
            noise_mode,
            process_fields=self._ode_state_fields,
            observation_fields=tuple(f.name for f in fields(self.PhysicalState)),
        )

        env_properties = self.EnvProperties(
            physical_normalizations=self.PhysicalState(**physical_normalizations),
            action_normalizations=self.Action(**action_normalizations),
            static_params=self.StaticParams(**static_params),
        )
        super().__init__(batch_size, env_properties=env_properties, tau=tau, solver=solver)

    # (noise validation lives on CoreEnvironment._validated_noise — shared
    # with the PMSM's stochastic constructor args)

    # ------------------------------------------------------------------
    # reset / observation / reconstruction
    # ------------------------------------------------------------------

    def _wrap_angles(self, y):
        if not self._angle_fields:
            return y
        if getattr(self, "fast_math", False):
            from exciting_environments_tpu.ops.fastmath import wrap_angle_fast

            y = list(y)
            for name in self._angle_fields:
                y[self._ode_state_fields.index(name)] = wrap_angle_fast(
                    y[self._ode_state_fields.index(name)]
                )
            return tuple(y)
        return super()._wrap_angles(y)

    @property
    def _physical_field_names(self):
        return tuple(f.name for f in fields(self.PhysicalState))

    @partial(jax.jit, static_argnums=0)
    def init_state(self, env_properties, rng=None, vmap_helper=None):
        """Default or random initial state for one instance.

        Values are drawn (or taken from ``_default_init_norm``) in normalized
        coordinates and denormalized into SI units, mirroring
        ``pendulum_env.py:261-295``.
        """
        names = self._physical_field_names
        if rng is None:
            phys = self.PhysicalState(**{n: self._default_init_norm.get(n, 0.0) for n in names})
            subkey = jnp.nan
        else:
            state_norm = jax.random.uniform(
                rng, minval=self._init_uniform_minval, maxval=1, shape=(len(names),)
            )
            phys = self.PhysicalState(**{n: state_norm[i] for i, n in enumerate(names)})
            key, subkey = jax.random.split(rng)

        additions = self._init_solver_additions(env_properties, phys)
        ref = self._nan_reference()
        norm_state = self.State(physical_state=phys, PRNGKey=subkey, additions=additions, reference=ref)
        return self.denormalize_state(norm_state, env_properties)

    @partial(jax.jit, static_argnums=0)
    def generate_observation(self, state, env_properties):
        """Normalized physical state, then any tracked reference components."""
        norm_state = self.normalize_state(state, env_properties)
        obs = jnp.hstack(tuple(getattr(norm_state.physical_state, n) for n in self._physical_field_names))
        for name in self.control_state:
            obs = jnp.hstack((obs, getattr(norm_state.reference, name)))
        return obs

    @partial(jax.jit, static_argnums=0)
    def generate_state_from_observation(self, obs, env_properties, key=None):
        """Inverse of :meth:`generate_observation` (bijective for these envs)."""
        names = self._physical_field_names
        phys = self.PhysicalState(**{n: obs[i] for i, n in enumerate(names)})
        subkey = key if key is not None else jnp.nan
        additions = self._init_solver_additions(env_properties, phys)
        ref = self._nan_reference()
        with structures.copy_and_mutate(ref, validate=False) as new_ref:
            for pos, name in enumerate(self.control_state):
                setattr(new_ref, name, obs[len(names) + pos])
        norm_state = self.State(physical_state=phys, PRNGKey=subkey, additions=additions, reference=new_ref)
        return self.denormalize_state(norm_state, env_properties)

    # ------------------------------------------------------------------
    # reward / flags / constraints
    # ------------------------------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def generate_reward(self, state, action, env_properties):
        """Negative squared tracking error over the controlled components;
        angle components use the sin/cos distance to avoid the ±pi seam."""
        reward = 0
        norm_state = self.normalize_state(state, env_properties)
        for name in self.control_state:
            if name in self._sincos_reward_fields:
                theta = getattr(state.physical_state, name)
                theta_ref = getattr(state.reference, name)
                reward += -(
                    (jnp.sin(theta) - jnp.sin(theta_ref)) ** 2 + (jnp.cos(theta) - jnp.cos(theta_ref)) ** 2
                )
            else:
                reward += -(
                    (getattr(norm_state.physical_state, name) - getattr(norm_state.reference, name)) ** 2
                )
        return jnp.array([reward])

    def default_soft_constraints(self, state, action_norm, env_properties):
        """ReLU(|x|-1) soft constraints on the declared fields plus the action."""
        state_norm = self.normalize_state(state, env_properties)
        physical_state_norm = state_norm.physical_state
        with structures.copy_and_mutate(physical_state_norm, validate=False) as phys_soft_const:
            for field in fields(phys_soft_const):
                name = field.name
                if name in self._soft_constrained_fields:
                    setattr(
                        phys_soft_const,
                        name,
                        jax.nn.relu(jnp.abs(getattr(physical_state_norm, name)) - 1.0),
                    )
                else:
                    setattr(phys_soft_const, name, jnp.nan)
        act_soft_constr = jax.nn.relu(jnp.abs(action_norm) - 1.0)
        return phys_soft_const, act_soft_constr

    @partial(jax.jit, static_argnums=0)
    def generate_truncated(self, state, env_properties):
        """Flag per observation component: left the normalized band."""
        obs = self.generate_observation(state, env_properties)
        return jnp.abs(obs) > 1

    @partial(jax.jit, static_argnums=0)
    def generate_terminated(self, state, reward, env_properties):
        """Terminal when the tracking reward is exactly zero."""
        return reward == 0

    # ------------------------------------------------------------------
    # descriptions
    # ------------------------------------------------------------------

    @property
    def obs_description(self):
        return np.hstack(
            [
                np.array(list(self._physical_field_names)),
                np.array([name + "_ref" for name in self.control_state]),
            ]
        )

    @property
    def action_description(self):
        return np.array([f.name for f in fields(self.Action)])
