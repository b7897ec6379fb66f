"""A true :class:`gymnasium.vector.VectorEnv` over the batched functional API.

The reference's ``GymWrapper`` (``gym_wrapper.py:14``) is Gym-*inspired* but
not a Gymnasium environment: it returns ``(obs, reward, terminated,
truncated)`` without infos, declares no observation/action spaces, and never
autoresets — so it cannot be handed to RL libraries that consume the
Gymnasium vector API (CleanRL, SB3's VecEnv adapters, rlax training loops).
This adapter implements the actual API surface on top of the engine:

* ``single_observation_space`` / ``single_action_space`` Boxes (normalized
  action bounds [-1, 1]; observations nominally [-1, 1] but unbounded — the
  engine truncates on ``|obs| > 1`` rather than clipping),
* Gymnasium's **NEXT_STEP autoreset** protocol (``metadata["autoreset_mode"]``)
  — a sub-environment that ended on step *t* ignores its action on step
  *t + 1* and returns its reset observation with ``reward = 0``,
* optional ``max_episode_steps`` time-limit truncation (the engine's
  environments rarely terminate on their own),
* per-episode random tracking references for ``control_state`` fields,
  drawn from the env's ``init_state`` distribution like
  ``GymWrapper.generate_new_ref`` (held constant within an episode).

TPU-first: where ``gymnasium.vector.SyncVectorEnv`` loops over
sub-environments on the host, here the *entire* vector step — stepped
branch, reset branch, per-env autoreset select, reward/flag evaluation and
the time-limit counter — is one jitted on-device program; the host only
converts the five result arrays to NumPy.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import gymnasium
from gymnasium import spaces as gym_spaces
from gymnasium.vector import AutoresetMode, VectorEnv
from gymnasium.vector.utils import batch_space

from exciting_environments_tpu.utils import episodes


class GymnasiumVectorEnv(VectorEnv):
    """Vectorized Gymnasium facade over a batched ``CoreEnvironment``.

    Args:
        env: a batched environment (its ``batch_size`` becomes ``num_envs``).
        seed: seed of the adapter's PRNG chain (resets, episode references).
        max_episode_steps: truncate every episode after this many steps
            (``None`` disables the time limit).
    """

    metadata = {"autoreset_mode": AutoresetMode.NEXT_STEP, "render_modes": []}

    def __init__(self, env, seed: int = 0, max_episode_steps: int | None = None):
        from exciting_environments_tpu.core.classic import ClassicODEEnvironment

        # classic default termination is reward == 0, and without tracked
        # references the tracking reward is identically zero — every step
        # would terminate, silently feeding degenerate 1-step episodes to
        # the RL library consuming this API
        if (
            isinstance(env, ClassicODEEnvironment)
            and not env.control_state
            and type(env).generate_terminated is ClassicODEEnvironment.generate_terminated
        ):
            import warnings

            warnings.warn(
                "this env has no control_state: its tracking reward is identically "
                "zero, so the default terminated rule (reward == 0) fires every "
                "step and every episode is 1 step long — construct it with "
                "control_state=[...] (per-episode random references are drawn "
                "automatically) or override generate_terminated",
                stacklevel=2,
            )
        self.env = env
        self.num_envs = env.batch_size
        self.max_episode_steps = max_episode_steps
        obs_dim = len(env.obs_description)
        act_dim = env.action_dim
        self.single_observation_space = gym_spaces.Box(
            -np.inf, np.inf, (obs_dim,), np.float32
        )
        self.single_action_space = gym_spaces.Box(-1.0, 1.0, (act_dim,), np.float32)
        self.observation_space = batch_space(self.single_observation_space, self.num_envs)
        self.action_space = batch_space(self.single_action_space, self.num_envs)
        self.render_mode = None
        self.spec = None
        self._key = jax.random.PRNGKey(seed)
        self._state = None
        self._autoreset = jnp.zeros((self.num_envs,), bool)
        self._elapsed = jnp.zeros((self.num_envs,), jnp.int32)

    @classmethod
    def from_registry(cls, env_id, num_envs: int, seed: int = 0,
                      max_episode_steps: int | None = None, **env_kwargs):
        """Build the adapter around a freshly constructed registry env, e.g.
        ``GymnasiumVectorEnv.from_registry(EnvironmentRegistry.PENDULUM,
        num_envs=128, control_state=["theta"])``."""
        return cls(
            env_id.make(batch_size=num_envs, **env_kwargs),
            seed=seed, max_episode_steps=max_episode_steps,
        )

    # -- device programs ----------------------------------------------------

    def _fresh(self, key):
        """Random full-batch reset state with drawn per-episode references
        plus its observations — the reset program and the step program's
        reset branch (one shared impl: ``utils/episodes.py``)."""
        return episodes.reset_with_references(self.env, key)

    @partial(jax.jit, static_argnums=0)
    def _step_program(self, state, autoreset, elapsed, action, key):
        B = self.num_envs

        # stepped branch: env step + reward/flag evaluation (GymWrapper's
        # gym_step contract; one shared impl, utils/episodes.py)
        obs_s, state_s, reward, term, trunc, elapsed_s = episodes.step_with_flags(
            self.env, state, action, elapsed, self.max_episode_steps
        )

        # reset branch (selected per env by the autoreset mask); the cond
        # skips the whole-batch reset draw on the common no-reset step —
        # both branches stay inside this one jitted program
        obs_r, state_r = jax.lax.cond(
            autoreset.any(),
            lambda k: self._fresh(k),
            lambda k: (obs_s, state_s),
            key,
        )

        def sel(r, s):
            m = autoreset.reshape((B,) + (1,) * (r.ndim - 1))
            return jnp.where(m, r, s)

        state_n = jax.tree_util.tree_map(sel, state_r, state_s)
        obs = sel(obs_r, obs_s)
        reward = jnp.where(autoreset, jnp.zeros((), reward.dtype), reward)
        term = jnp.where(autoreset, False, term)
        trunc = jnp.where(autoreset, False, trunc)
        elapsed_n = jnp.where(autoreset, 0, elapsed_s)
        return obs, reward, term, trunc, state_n, term | trunc, elapsed_n

    # -- Gymnasium API -------------------------------------------------------

    def reset(self, *, seed: int | None = None, options=None):
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._key, k = jax.random.split(self._key)
        obs, self._state = episodes.jitted_reset(self.env)(k)
        self._autoreset = jnp.zeros((self.num_envs,), bool)
        self._elapsed = jnp.zeros((self.num_envs,), jnp.int32)
        return np.asarray(obs, dtype=np.float32), {}

    def step(self, actions):
        if self._state is None:
            raise RuntimeError("step() called before reset()")
        action = jnp.asarray(actions, dtype=jnp.result_type(float)).reshape(
            self.num_envs, self.env.action_dim
        )
        self._key, k = jax.random.split(self._key)
        obs, reward, term, trunc, self._state, self._autoreset, self._elapsed = (
            self._step_program(self._state, self._autoreset, self._elapsed, action, k)
        )
        return (
            np.asarray(obs, dtype=np.float32),
            np.asarray(reward, dtype=np.float32),
            np.asarray(term, dtype=bool),
            np.asarray(trunc, dtype=bool),
            {},
        )

    def render(self):
        return None

    def close_extras(self, **kwargs):
        pass
