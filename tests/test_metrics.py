"""Streaming/windowed fleet metrics: exactness of the Welford/Chan merges and
the cross-mesh psum reduction (8 virtual devices)."""

import jax
import jax.numpy as jnp
import numpy as np

from exciting_environments_tpu.parallel.metrics import (
    RunningStats,
    across_mesh,
    merge,
    running_init,
    running_summary,
    running_update,
    window_init,
    window_max,
    window_mean,
    window_min,
    window_push,
)


def test_running_stats_matches_numpy():
    rng = np.random.default_rng(0)
    chunks = [rng.normal(3.0, 2.0, size=(257,)) for _ in range(5)]
    stats = running_init(dtype=jnp.float64)
    for c in chunks:
        stats = running_update(stats, jnp.asarray(c))
    s = running_summary(stats)
    all_v = np.concatenate(chunks)
    assert int(s["count"]) == all_v.size
    np.testing.assert_allclose(float(s["mean"]), all_v.mean(), rtol=1e-12)
    np.testing.assert_allclose(float(s["std"]), all_v.std(), rtol=1e-10)
    np.testing.assert_allclose(float(s["min"]), all_v.min())
    np.testing.assert_allclose(float(s["max"]), all_v.max())


def test_running_stats_vector_metrics():
    """Per-metric leading dims: one accumulator tracking (3,) metrics."""
    rng = np.random.default_rng(1)
    data = rng.normal(size=(64, 3))
    stats = running_init(shape=(3,), dtype=jnp.float64)
    stats = running_update(stats, jnp.asarray(data), axis=(0,))
    s = running_summary(stats)
    np.testing.assert_allclose(np.asarray(s["mean"]), data.mean(0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s["std"]), data.std(0), rtol=1e-10)


def test_pairwise_merge_associative():
    rng = np.random.default_rng(2)
    a, b, c = (rng.normal(size=(100,)) for _ in range(3))
    sa = running_update(running_init(dtype=jnp.float64), jnp.asarray(a))
    sb = running_update(running_init(dtype=jnp.float64), jnp.asarray(b))
    sc = running_update(running_init(dtype=jnp.float64), jnp.asarray(c))
    left = merge(merge(sa, sb), sc)
    right = merge(sa, merge(sb, sc))
    np.testing.assert_allclose(float(left.mean), float(right.mean), rtol=1e-12)
    np.testing.assert_allclose(float(left.m2), float(right.m2), rtol=1e-10)
    # merging with an empty accumulator is the identity
    empty = running_init(dtype=jnp.float64)
    np.testing.assert_allclose(float(merge(sa, empty).mean), float(sa.mean))


def test_across_mesh_matches_global():
    from jax.sharding import Mesh, PartitionSpec as P

    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("batch",))
    rng = np.random.default_rng(3)
    data = rng.normal(5.0, 1.5, size=(8, 500))

    def local(values):
        stats = running_update(running_init(dtype=jnp.float64), values)
        return across_mesh(stats, "batch")

    out = jax.jit(
        jax.shard_map(local, mesh=mesh, in_specs=P("batch"), out_specs=P())
    )(jnp.asarray(data.reshape(-1)))
    s = running_summary(out)
    np.testing.assert_allclose(float(s["mean"]), data.mean(), rtol=1e-12)
    np.testing.assert_allclose(float(s["std"]), data.std(), rtol=1e-10)
    assert int(s["count"]) == data.size


def test_window_ring_buffer():
    w = window_init(4, dtype=jnp.float64)
    for v in (1.0, 2.0, 3.0):
        w = window_push(w, v)
    np.testing.assert_allclose(float(window_mean(w)), 2.0)
    np.testing.assert_allclose(float(window_min(w)), 1.0)
    for v in (4.0, 5.0):  # wraps: window is now (2, 3, 4, 5)
        w = window_push(w, v)
    np.testing.assert_allclose(float(window_mean(w)), 3.5)
    np.testing.assert_allclose(float(window_max(w)), 5.0)
    np.testing.assert_allclose(float(window_min(w)), 2.0)


def test_window_threads_through_scan():
    def body(w, v):
        w = window_push(w, v)
        return w, window_mean(w)

    w0 = window_init(8, dtype=jnp.float64)
    _, means = jax.lax.scan(body, w0, jnp.arange(20, dtype=jnp.float64))
    # after >= 8 pushes the mean is the trailing-8 average
    np.testing.assert_allclose(float(means[-1]), np.arange(12, 20).mean())
