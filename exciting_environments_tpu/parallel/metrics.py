"""Streaming and windowed fleet metrics for long-running simulation loops.

The thin one-shot reductions at the bottom of this module
(:func:`mean_metric` and friends) answer "what is the mean right now" with a
single ``psum``-style all-reduce; a production excitation/RL data loop
additionally needs *running* statistics over millions of steps (throughput
accounting, reward drift, constraint-violation rates) without ever shipping
per-step data to the host.  This module provides:

* :class:`RunningStats` — an O(1)-state Welford/Chan accumulator (count,
  mean, M2, min, max) that lives on-device, is updated once per rollout
  chunk, and merges exactly across devices with one ``psum`` round
  (:func:`across_mesh`) or pairwise (:func:`merge`);
* :class:`Window` — a fixed-size on-device ring buffer for windowed means
  (e.g. "mean reward over the last K chunks"), pure-functional like
  everything else so it threads through ``lax.scan``/``jit`` carries.

Everything is a pytree of arrays: accumulators can themselves be vmapped,
sharded, checkpointed with ``utils.checkpoint``, and carried through scans.
No reference counterpart (the reference has no metrics subsystem, SURVEY §5);
the cross-device merge is the textbook Chan et al. parallel-variance
formula realized with XLA collectives over ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from exciting_environments_tpu.core.structures import pytree_dataclass


@pytree_dataclass
class RunningStats:
    """Streaming count/mean/variance/min/max accumulator state."""

    count: jax.Array
    mean: jax.Array
    m2: jax.Array
    min: jax.Array
    max: jax.Array


def running_init(shape=(), dtype=jnp.float32) -> RunningStats:
    """A fresh accumulator; ``shape`` adds per-metric leading dimensions."""
    z = jnp.zeros(shape, dtype)
    return RunningStats(
        count=z,
        mean=z,
        m2=z,
        min=jnp.full(shape, jnp.inf, dtype),
        max=jnp.full(shape, -jnp.inf, dtype),
    )


def running_update(stats: RunningStats, values, axis=None) -> RunningStats:
    """Fold a batch of ``values`` into the accumulator (batched Welford).

    ``axis`` selects which axes of ``values`` are the sample axes (default:
    all); remaining axes must broadcast against the accumulator shape.
    """
    import numpy as _np

    values = jnp.asarray(values, stats.mean.dtype)
    if axis is None:
        axis = tuple(range(values.ndim - stats.mean.ndim))
    ax = axis if isinstance(axis, tuple) else (axis,)
    if not ax:
        ax = (0,) if values.ndim > stats.mean.ndim else ()
    if ax:
        n_b = float(_np.prod([values.shape[a] for a in ax]))
        mean_b = jnp.mean(values, axis=ax)
        m2_b = jnp.sum((values - jnp.expand_dims(mean_b, ax)) ** 2, axis=ax)
        mn, mx = jnp.min(values, axis=ax), jnp.max(values, axis=ax)
    else:  # single sample
        n_b, mean_b, m2_b, mn, mx = 1.0, values, jnp.zeros_like(values), values, values
    batch = RunningStats(
        count=jnp.asarray(n_b, stats.count.dtype) + jnp.zeros_like(stats.count),
        mean=mean_b,
        m2=m2_b,
        min=mn,
        max=mx,
    )
    return merge(stats, batch)


def merge(a: RunningStats, b: RunningStats) -> RunningStats:
    """Exact pairwise merge (Chan et al.); safe when either side is empty."""
    n = a.count + b.count
    safe_n = jnp.where(n > 0, n, 1)
    delta = b.mean - a.mean
    mean = a.mean + delta * (b.count / safe_n)
    m2 = a.m2 + b.m2 + delta * delta * (a.count * b.count / safe_n)
    return RunningStats(
        count=n,
        mean=jnp.where(n > 0, mean, 0.0),
        m2=jnp.where(n > 0, m2, 0.0),
        min=jnp.minimum(a.min, b.min),
        max=jnp.maximum(a.max, b.max),
    )


def across_mesh(stats: RunningStats, axis_name: str) -> RunningStats:
    """Merge per-device accumulators into the global one inside ``shard_map``.

    One ``psum`` round over ICI: global count, count-weighted mean, and the
    Chan-corrected M2 (each device adds the dispersion of its local mean
    around the global mean).  The result is replicated on every device.
    """
    n = jax.lax.psum(stats.count, axis_name)
    safe_n = jnp.where(n > 0, n, 1)
    mean = jax.lax.psum(stats.count * stats.mean, axis_name) / safe_n
    m2 = jax.lax.psum(stats.m2 + stats.count * (stats.mean - mean) ** 2, axis_name)
    return RunningStats(
        count=n,
        mean=jnp.where(n > 0, mean, 0.0),
        m2=jnp.where(n > 0, m2, 0.0),
        min=jax.lax.pmin(stats.min, axis_name),
        max=jax.lax.pmax(stats.max, axis_name),
    )


def running_summary(stats: RunningStats) -> dict:
    """Readout: mean / std (population) / min / max / count."""
    var = stats.m2 / jnp.where(stats.count > 0, stats.count, 1)
    return {
        "count": stats.count,
        "mean": stats.mean,
        "std": jnp.sqrt(var),
        "min": stats.min,
        "max": stats.max,
    }


@pytree_dataclass
class Window:
    """Fixed-size on-device ring buffer of scalar (or per-metric) samples."""

    buffer: jax.Array  # (capacity, ...) samples, NaN-initialized
    index: jax.Array  # next write slot
    filled: jax.Array  # number of valid entries (saturates at capacity)


def window_init(capacity: int, shape=(), dtype=jnp.float32) -> Window:
    return Window(
        buffer=jnp.full((capacity,) + tuple(shape), jnp.nan, dtype),
        index=jnp.zeros((), jnp.int32),
        filled=jnp.zeros((), jnp.int32),
    )


def window_push(w: Window, value) -> Window:
    capacity = w.buffer.shape[0]
    buffer = jax.lax.dynamic_update_index_in_dim(
        w.buffer, jnp.asarray(value, w.buffer.dtype), w.index, 0
    )
    return Window(
        buffer=buffer,
        index=(w.index + 1) % capacity,
        filled=jnp.minimum(w.filled + 1, capacity),
    )


def _masked(w: Window):
    capacity = w.buffer.shape[0]
    mask = jnp.arange(capacity) < w.filled
    mask = mask.reshape((capacity,) + (1,) * (w.buffer.ndim - 1))
    return mask


def window_mean(w: Window):
    mask = _masked(w)
    total = jnp.sum(jnp.where(mask, w.buffer, 0.0), axis=0)
    return total / jnp.maximum(w.filled, 1)


def window_min(w: Window):
    return jnp.min(jnp.where(_masked(w), w.buffer, jnp.inf), axis=0)


def window_max(w: Window):
    return jnp.max(jnp.where(_masked(w), w.buffer, -jnp.inf), axis=0)


# ---------------------------------------------------------------------------
# One-shot cross-chip reductions.  Environment stepping needs no
# communication (batch entries are independent); a data-generation loop's
# instantaneous queries — mean reward, violation fraction — are single
# reductions that XLA lowers to a local reduce plus one all-reduce over ICI
# when the jitted reduction consumes a mesh-sharded array (SURVEY §5,
# "communication backend" row).
# ---------------------------------------------------------------------------


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

    def reduce(x):
        return jax.lax.psum(x, mesh_axis)

    return jax.jit(reduce)
