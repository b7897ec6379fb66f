"""Profiling, tracing and numerical-debugging utilities.

The reference has no profiling or observability hooks at all (SURVEY §5).
This module adds the TPU-native set:

* :func:`trace` — ``jax.profiler`` trace context writing TensorBoard-readable
  traces (view with ``tensorboard --logdir``/xprof).
* :func:`annotate` — named ``TraceAnnotation`` regions for the trace timeline.
* :class:`Timer` / :func:`benchmark_steps_per_sec` — steps/sec measurement with
  compile-excluded warmup and device synchronization.
* :func:`debug_nans` / :func:`checked` — NaN/Inf detection toggles
  (``jax_debug_nans``) and explicit finite-checks on pytrees.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a ``jax.profiler`` device trace into ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region on the profiler timeline (host + device annotation)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Temporarily enable ``jax_debug_nans`` (errors at the op producing NaN)."""
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checked(tree, name: str = "value"):
    """Raise if any leaf of ``tree`` contains non-finite entries (host sync)."""
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        arr = jnp.asarray(leaf)
        if jnp.issubdtype(arr.dtype, jnp.floating) and not bool(jnp.isfinite(arr).all()):
            raise FloatingPointError(f"non-finite values in {name}{jax.tree_util.keystr(path)}")
    return tree


class _MeasureHandle:
    """Collects the value(s) produced inside a :meth:`Timer.measure` block so
    the timer can ``block_until_ready`` on them at exit."""

    def __init__(self):
        self._pending = []

    def block(self, value):
        """Register ``value`` (any pytree of arrays) to be synchronized when
        the measure block exits; returns it unchanged for inline use."""
        self._pending.append(value)
        return value


@dataclass
class Timer:
    """Wall-clock timer that synchronizes the device before reading.

    The context manager yields a handle whose ``block(value)`` registers the
    work produced *inside* the block for synchronization at exit (a value
    cannot be passed in up front — it does not exist yet)::

        timer = Timer()
        with timer.measure() as m:
            m.block(step_fn(state, actions))

    ``result_to_block`` may alternatively be a ZERO-ARG CALLABLE evaluated at
    exit (e.g. ``lambda: out`` closing over a variable assigned in the block).
    """

    times: list = field(default_factory=list)

    @contextlib.contextmanager
    def measure(self, result_to_block: Callable = None):
        handle = _MeasureHandle()
        t0 = time.perf_counter()
        yield handle
        if handle._pending:
            jax.block_until_ready(handle._pending)
        if result_to_block is not None:
            jax.block_until_ready(result_to_block())
        self.times.append(time.perf_counter() - t0)

    @property
    def best(self):
        return min(self.times)

    @property
    def mean(self):
        return sum(self.times) / len(self.times)


def benchmark_steps_per_sec(fn: Callable, *args, n_env_steps: int, repeats: int = 3, inputs=None):
    """Measure sustained env-steps/sec of ``fn``.

    The first call is excluded (compile); subsequent calls are synchronized
    with ``block_until_ready``.  Returns ``(steps_per_sec, best_seconds)``.

    Pass ``inputs`` (a list of distinct argument tuples, first entry used for
    warmup) when benchmarking on runtimes that cache identical
    (executable, arguments) executions — re-timing the same call there
    measures the cache, not the device.  Without ``inputs``, ``fn(*args)`` is
    repeated as-is.
    """
    if inputs is None:
        inputs = [args] * (repeats + 1)
    out = fn(*inputs[0])
    jax.block_until_ready(out)
    timer = Timer()
    for call_args in inputs[1:]:
        with timer.measure():
            out = fn(*call_args)
            jax.block_until_ready(out)
    return n_env_steps / timer.best, timer.best
