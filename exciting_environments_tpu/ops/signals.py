"""Excitation-signal generators for system identification and RL data capture.

The reference generates excitation implicitly (random piecewise-constant
references inside the GymWrapper, ``gym_wrapper.py:177-192``); this module
provides the standard identification signals as first-class, fully batched,
jit-compatible generators producing normalized action sequences of shape
``(batch_size, n_steps, action_dim)`` — ready for ``vmap_rollout`` /
``vmap_sim_ahead``:

* :func:`aprbs` — amplitude-modulated pseudo-random binary/hold sequence
  (random levels held for random durations), the workhorse excitation for
  nonlinear system identification.
* :func:`chirp` — linear frequency sweep.
* :func:`multisine` — random-phase multisine with a flat harmonic spectrum
  (crest-factor friendly broadband excitation).
* :func:`white_uniform` — i.i.d. uniform noise.

Everything is computed on-device; generating a 65,536 x 1024-step APRBS slab
is a single fused program.

The fused rollout kernels stream actions time-major; convert a slab once
with :func:`to_time_major` and replay it copy-free
(``env_fused_rollout(..., time_major=True)``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def to_time_major(actions):
    """Relayout a ``(B, n_steps, A)`` slab to ``(n_steps, B, A)`` — the
    layout the rollout kernels stream.  One transposed copy here saves one
    per rollout call."""
    return jnp.transpose(actions, (1, 0, 2))


def white_uniform(key, batch_size: int, n_steps: int, action_dim: int, minval=-1.0, maxval=1.0):
    """I.i.d. uniform noise in [minval, maxval]."""
    return jax.random.uniform(
        key, (batch_size, n_steps, action_dim), minval=minval, maxval=maxval
    )


def aprbs(key, batch_size: int, n_steps: int, action_dim: int,
          hold_min: int = 10, hold_max: int = 100, minval=-1.0, maxval=1.0):
    """Amplitude-modulated pseudo-random hold sequence.

    Each (batch, action-dim) channel holds a uniformly drawn level for a
    uniformly drawn duration in ``[hold_min, hold_max)`` steps, then jumps to
    a fresh level.  Implemented branch-free: per-step "switch" events are
    drawn via a hazard comparison and levels advance with a cumulative-sum
    segment index, so the whole slab is one fused program (no scan).
    """
    k_levels, k_holds = jax.random.split(key)
    # upper bound on the number of segments
    max_segments = n_steps // hold_min + 2
    levels = jax.random.uniform(
        k_levels, (batch_size, max_segments, action_dim), minval=minval, maxval=maxval
    )
    durations = jax.random.randint(
        k_holds, (batch_size, max_segments, action_dim), minval=hold_min, maxval=hold_max
    )
    # segment start times; searchsorted gives each step its segment index
    starts = jnp.cumsum(durations, axis=1)  # end time of each segment
    t = jnp.arange(n_steps)

    def pick(levels_bd, starts_bd):
        # levels_bd: (max_segments,), starts_bd: (max_segments,)
        idx = jnp.searchsorted(starts_bd, t, side="right")
        idx = jnp.clip(idx, 0, max_segments - 1)
        return levels_bd[idx]

    return jax.vmap(jax.vmap(pick, in_axes=(1, 1), out_axes=1), in_axes=(0, 0))(levels, starts)


def chirp(batch_size: int, n_steps: int, action_dim: int, tau: float,
          f0: float, f1: float, amplitude: float = 1.0):
    """Linear chirp from ``f0`` to ``f1`` Hz over the horizon (same signal in
    every batch entry and action dimension)."""
    t = jnp.arange(n_steps) * tau
    t1 = n_steps * tau
    phase = 2 * jnp.pi * (f0 * t + 0.5 * (f1 - f0) / t1 * t**2)
    sig = amplitude * jnp.sin(phase)
    return jnp.broadcast_to(sig[None, :, None], (batch_size, n_steps, action_dim))


def multisine(key, batch_size: int, n_steps: int, action_dim: int, tau: float,
              f_min: float, f_max: float, n_harmonics: int = 16, amplitude: float = 1.0):
    """Random-phase multisine: ``n_harmonics`` equally spaced frequencies in
    ``[f_min, f_max]`` with i.i.d. uniform phases per (batch, dim) channel,
    normalized to the requested peak amplitude."""
    freqs = jnp.linspace(f_min, f_max, n_harmonics)
    phases = jax.random.uniform(
        key, (batch_size, action_dim, n_harmonics), minval=0.0, maxval=2 * jnp.pi
    )
    t = jnp.arange(n_steps) * tau  # (T,)
    angles = 2 * jnp.pi * freqs[None, None, :, None] * t[None, None, None, :] + phases[..., None]
    sig = jnp.sum(jnp.sin(angles), axis=2)  # (B, A, T)
    sig = sig / jnp.max(jnp.abs(sig), axis=-1, keepdims=True) * amplitude
    return jnp.moveaxis(sig, 1, 2)  # (B, T, A)
