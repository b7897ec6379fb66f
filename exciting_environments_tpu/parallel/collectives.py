"""Cross-chip metric reductions for sharded environment fleets.

Environment stepping needs no communication (batch entries are independent);
the collectives a production excitation/RL data-generation loop does need are
scalar reductions of per-environment metrics — mean reward, constraint
violation counts, throughput accounting.  These ride ICI as single ``psum``
style reductions inserted by XLA when the jitted reduction consumes a
mesh-sharded array (SURVEY §5, "communication backend" row).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def mean_metric(values):
    """Global mean of a (possibly mesh-sharded) per-environment metric.

    Under a sharded input XLA lowers this to a local reduction plus one
    all-reduce over ICI; the result is replicated on every chip.
    """
    return jnp.mean(values)


@jax.jit
def sum_metric(values):
    """Global sum of a (possibly mesh-sharded) per-environment metric."""
    return jnp.sum(values)


@jax.jit
def violation_fraction(truncated):
    """Fraction of environments currently out of bounds."""
    return jnp.mean(jnp.any(truncated, axis=tuple(range(1, truncated.ndim))).astype(jnp.float32))


def gather_to_host(tree):
    """Fetch a sharded pytree to host memory (one all-gather per leaf).

    Use sparingly: this is the only host<->device traffic a simulation loop
    should incur beyond initial placement.
    """
    return jax.tree_util.tree_map(lambda x: jax.device_get(x), tree)


def psum_across(mesh_axis: str):
    """Explicit ``psum`` reduction for use inside ``shard_map`` bodies."""

    @partial(jax.jit, static_argnums=())
    def reduce(x):
        return jax.lax.psum(x, mesh_axis)

    return reduce
