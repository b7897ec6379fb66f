"""Stateful Gymnasium-style facade over the functional environment API.

Behavior-compatible with ``/root/reference/exciting_environments/gym_wrapper.py``:
the wrapper stores the flattened batched state between calls, jit-compiles a
combined ``vmap_step`` + reward/terminated/truncated computation, and can
generate random piecewise-constant tracking references with a per-batch
hold-steps counter.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.tree_util import tree_flatten, tree_structure, tree_unflatten

from exciting_environments_tpu.core import structures
from exciting_environments_tpu.core.registration import EnvironmentRegistry


class GymWrapper:
    """Wrap a :class:`CoreEnvironment` into a stateful ``step``/``reset`` loop."""

    def __init__(
        self,
        env,
        control_state=None,
        generate_reward=None,
        generate_terminated=None,
        generate_truncated=None,
        ref_params=None,
    ):
        self.env = env

        if control_state is None:
            print(f"No chosen control state in the GymWrapper. Control state is set to {self.env.control_state}.")
            self.control_state = self.env.control_state
        else:
            assert type(control_state) == list, "Control state has to be a list."
            valid = [f.name for f in structures.fields(self.env.PhysicalState)]
            for i in control_state:
                assert i in valid, f"Given control state {i} is no valid physical state {valid}."
            self.control_state = control_state
            self.env.control_state = control_state

        self.ref_gen = False

        _, init_state = self.env.vmap_reset()

        if not ref_params:
            ref_params = {
                "hold_steps_min": 10,
                "hold_steps_max": 1000,
            }
        self.ref_params = ref_params
        self.reference_hold_steps = jnp.zeros((self.env.batch_size, 1))

        self.state = tree_flatten(init_state)[0]
        self.state_tree_struct = tree_structure(init_state)

        self.generate_reward = generate_reward or self.env.generate_reward
        self.generate_truncated = generate_truncated or self.env.generate_truncated
        self.generate_terminated = generate_terminated or self.env.generate_terminated

    @classmethod
    def from_env(cls, env_type: EnvironmentRegistry, **env_kwargs):
        """Create a GymWrapper around a freshly constructed registry env."""
        env = env_type.make(**env_kwargs)
        return cls(env)

    def step(self, action):
        """One simulation step for all batches.

        Returns ``(observation, reward, terminated, truncated)`` with shapes
        ``(batch_size, obs_dim)`` / ``(batch_size, 1)`` / ``(batch_size, 1)`` /
        ``(batch_size, obs_dim)``.
        """
        obs, reward, terminated, truncated, self.state, self.reference_hold_steps = self.gym_step(
            action, self.state, self.reference_hold_steps, bool(self.ref_gen and len(self.control_state))
        )
        return obs, reward, terminated, truncated

    @partial(jax.jit, static_argnums=(0, 4))
    def gym_step(self, action, state, reference_hold_steps, ref_active):
        """Jitted core of :meth:`step`: env step, optional reference update,
        reward/flag computation, state re-flattening.

        ``ref_active`` is an explicit static argument (instead of reading
        ``self.ref_gen`` at trace time) so toggling reference generation via
        ``reset(rng_ref=...)`` after a first ``step`` retraces instead of
        silently reusing the stale executable — a latent bug in the
        reference wrapper (``gym_wrapper.py:112`` reads the flag only when
        the jit cache misses).
        """
        state = tree_unflatten(self.state_tree_struct, state)

        obs, state = self.env.vmap_step(state, action)

        if ref_active:
            state, reference_hold_steps = jax.vmap(
                self.update_ref, in_axes=(0, self.env.in_axes_env_properties, 0)
            )(state, self.env.env_properties, reference_hold_steps)

        reward = jax.vmap(self.generate_reward, in_axes=(0, 0, self.env.in_axes_env_properties))(
            state, action, self.env.env_properties
        )
        terminated = jax.vmap(self.generate_terminated, in_axes=(0, 0, self.env.in_axes_env_properties))(
            state, reward, self.env.env_properties
        )
        truncated = jax.vmap(self.generate_truncated, in_axes=(0, self.env.in_axes_env_properties))(
            state, self.env.env_properties
        )
        state = tree_flatten(state)[0]
        return obs, reward, terminated, truncated, state, reference_hold_steps

    def reset(self, rng_env=None, rng_ref=None, initial_state=None):
        """Reset all batches; optionally (re)seed the reference generator."""
        if initial_state is not None:
            obs, state = self.env.vmap_reset(initial_state=tree_unflatten(self.state_tree_struct, initial_state))
        else:
            _, state = self.env.vmap_reset(rng_env)

        if rng_ref is not None:
            if len(rng_ref.shape) == 1:
                key = jax.random.split(rng_ref, num=self.env.batch_size)
            else:
                key = rng_ref
                assert rng_ref.shape[0] == self.env.batch_size

            with structures.copy_and_mutate(state, validate=False) as state:
                state.PRNGKey = key

            self.ref_gen = True
            state, self.reference_hold_steps = jax.vmap(
                self.generate_new_ref, in_axes=(0, self.env.in_axes_env_properties, 0)
            )(state, self.env.env_properties, jnp.zeros(self.env.batch_size))
        else:
            self.ref_gen = False
            print("Since no PRNGKey for reference was provided, reference generation is deactivated.")

        self.state = tree_flatten(state)[0]
        obs = jax.vmap(self.env.generate_observation, in_axes=(0, self.env.in_axes_env_properties))(
            state, self.env.env_properties
        )
        return obs, {}

    def update_ref(self, state, env_properties, hold_steps):
        """Draw a fresh reference when the hold counter expires."""
        state, hold_steps = jax.lax.cond(
            hold_steps[0] == 0, self.generate_new_ref, lambda a, b, c: (a, c), state, env_properties, hold_steps
        )
        hold_steps += -1
        return state, hold_steps

    def generate_new_ref(self, state, env_properties, hold_steps):
        """New random reference from the env's ``init_state`` distribution plus
        a random hold duration."""
        with structures.copy_and_mutate(state, validate=False) as new_state:
            init = self.env.init_state(env_properties, state.PRNGKey)
            for name in self.control_state:
                setattr(new_state.reference, name, getattr(init.physical_state, name))
            key, subkey = jax.random.split(init.PRNGKey)
            hold_steps = jax.random.randint(
                subkey,
                minval=self.ref_params["hold_steps_min"],
                maxval=self.ref_params["hold_steps_max"],
                shape=(1,),
            )
            new_state.PRNGKey = key
        return new_state, hold_steps

    def render(self, *_, **__):
        """Visualization is not implemented."""
        raise NotImplementedError("To be implemented!")

    def close(self):
        """Teardown is not implemented."""
        raise NotImplementedError("To be implemented!")
