"""Minimal gym-like spaces (reference ``exciting_environments/spaces.py``)."""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp


class Space:
    """Abstract observation/action space."""

    def sample(self, rng):
        raise NotImplementedError

    def contains(self, x: Any) -> bool:
        raise NotImplementedError


class Box(Space):
    """Axis-aligned box with uniform sampling (jitted on TPU)."""

    def __init__(self, low: float, high: float, shape: Tuple[int], dtype: jnp.dtype = jnp.float32):
        self.low = low
        self.high = high
        self.dtype = dtype
        self.shape = shape

    @partial(jax.jit, static_argnums=0)
    def sample(self, rng):
        return jax.random.uniform(rng, shape=self.shape, minval=self.low, maxval=self.high).astype(self.dtype)

    def contains(self, x: Any) -> bool:
        return jnp.logical_and(jnp.all(x >= self.low), jnp.all(x <= self.high))
