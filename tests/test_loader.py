"""Reader-side pipeline: lazy shard indexing and device prefetching."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from exciting_environments_tpu.io import DeviceLoader, ShardIndex, ShardWriter, read_shard_lazy


def _write(path, n_entries, shape=(16, 4)):
    expected = []
    with ShardWriter(path, use_native=False) as w:
        for i in range(n_entries):
            arr = np.arange(np.prod(shape), dtype=np.float32).reshape(shape) + 100 * i
            w.append({"obs": arr, "meta": np.full((3,), i, np.int32)}, name=f"e{i}")
            expected.append(arr)
    return expected


def test_shard_index_lazy_views(tmp_path):
    p = tmp_path / "a.extpu"
    expected = _write(p, 4)
    with ShardIndex(p) as idx:
        assert len(idx) == 4
        assert idx.names == [f"e{i}" for i in range(4)]
        name, arrays = idx.entry(2)
        assert name == "e2"
        np.testing.assert_array_equal(arrays["['obs']"], expected[2])
        # zero-copy: the view is backed by the mmap, not an owned buffer
        assert not arrays["['obs']"].flags["OWNDATA"]
    # materializing generator survives index closure
    out = list(read_shard_lazy(p))
    np.testing.assert_array_equal(out[3][1]["['obs']"], expected[3])
    assert out[3][1]["['obs']"].flags["OWNDATA"]


def test_shard_index_rejects_truncated(tmp_path):
    p = tmp_path / "a.extpu"
    _write(p, 2)
    data = p.read_bytes()
    (tmp_path / "trunc.extpu").write_bytes(data[:-5])
    with pytest.raises(ValueError, match="EXTPU1"):
        ShardIndex(tmp_path / "trunc.extpu")


def test_device_loader_roundtrip_order(tmp_path):
    paths = [tmp_path / "a.extpu", tmp_path / "b.extpu"]
    expected = _write(paths[0], 3) + _write(paths[1], 2)
    loader = DeviceLoader(paths, prefetch=2)
    assert len(loader) == 5
    seen = list(loader)
    assert [n for n, _ in seen] == ["e0", "e1", "e2", "e0", "e1"]
    for (name, batch), exp in zip(seen, expected):
        assert isinstance(batch["['obs']"], jax.Array)
        np.testing.assert_array_equal(np.asarray(batch["['obs']"]), exp)


def test_device_loader_mesh_sharding(tmp_path):
    p = tmp_path / "a.extpu"
    expected = _write(p, 2, shape=(8, 6))
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("batch",))
    sharding = NamedSharding(mesh, P("batch"))
    for (name, batch), exp in zip(DeviceLoader([p], sharding=sharding), expected):
        obs = batch["['obs']"]
        assert obs.sharding == sharding  # scattered across all 8 devices
        assert batch["['meta']"].sharding.is_fully_replicated  # (3,) can't tile 8-way
        np.testing.assert_array_equal(np.asarray(obs), exp)
        # sharded batches drop straight into pjit'd consumers
        total = jax.jit(lambda x: jnp.sum(x))(obs)
        np.testing.assert_allclose(float(total), exp.sum())


def test_device_loader_transform(tmp_path):
    p = tmp_path / "a.extpu"
    _write(p, 2)
    loader = DeviceLoader(
        [p], transform=lambda name, arrays: {k: v.astype(np.float16) for k, v in arrays.items()}
    )
    for _, batch in loader:
        assert batch["['obs']"].dtype == jnp.float16


def test_device_loader_propagates_errors(tmp_path):
    good = tmp_path / "good.extpu"
    _write(good, 1)
    bad = tmp_path / "bad.extpu"
    bad.write_bytes(b"garbage")
    it = iter(DeviceLoader([good, bad]))
    next(it)  # good entry arrives
    with pytest.raises(ValueError, match="EXTPU1"):
        for _ in it:
            pass


def test_device_loader_early_break_stops_worker(tmp_path):
    import threading
    import time

    p = tmp_path / "a.extpu"
    _write(p, 3)
    before = {t.ident for t in threading.enumerate()}
    # prefetch >= remaining entries: the worker reaches its terminal
    # q.put(None) with the queue full, which must also honor the stop flag
    for i, _ in enumerate(DeviceLoader([p], prefetch=2)):
        break  # generator close must not deadlock or leak the worker
    deadline = time.time() + 5.0
    while time.time() < deadline:
        leaked = [t for t in threading.enumerate() if t.ident not in before]
        if not leaked:
            return
        time.sleep(0.05)
    raise AssertionError(f"worker thread leaked: {leaked}")
