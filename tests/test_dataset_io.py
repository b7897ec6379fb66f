"""Native async shard writer: round-trips, backpressure, both backends."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.io import ShardWriter, read_shard
from exciting_environments_tpu.io.native import native_available
from exciting_environments_tpu.utils.collect import RolloutCollector

BACKENDS = [False] + ([True] if native_available() else [])


@pytest.mark.parametrize("use_native", BACKENDS, ids=["python", "native"][: len(BACKENDS)])
def test_trajectory_shard_roundtrip(tmp_path, use_native):
    env = excenvs.Pendulum(batch_size=8)
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), 8))
    collector = RolloutCollector(env)

    path = tmp_path / "run.extpu"
    trajs = []
    with ShardWriter(path, use_native=use_native) as w:
        assert w.native == use_native
        for i in range(3):
            actions = jax.random.uniform(jax.random.PRNGKey(i), (8, 10, 1), minval=-1, maxval=1)
            traj, state = collector.collect(state, actions)
            trajs.append(traj)
            w.append(traj, name=f"rollout_{i}")

    entries = read_shard(path)
    assert [name for name, _ in entries] == ["rollout_0", "rollout_1", "rollout_2"]
    for (name, arrays), traj in zip(entries, trajs):
        np.testing.assert_array_equal(arrays["['observations']"], np.asarray(traj.observations))
        np.testing.assert_array_equal(arrays["['actions']"], np.asarray(traj.actions))
        np.testing.assert_array_equal(arrays["['rewards']"], np.asarray(traj.rewards))


def test_native_builds_and_reports_written(tmp_path):
    if not native_available():
        pytest.skip("no C++ toolchain")
    w = ShardWriter(tmp_path / "x.extpu", use_native=True)
    w.append({"a": jnp.arange(1000.0)})
    written = w.close()
    # magic + 4000 payload bytes + footer
    assert written > 4000
    (name, arrays), = read_shard(tmp_path / "x.extpu")
    np.testing.assert_array_equal(arrays["['a']"], np.arange(1000.0))


@pytest.mark.parametrize("use_native", BACKENDS, ids=["python", "native"][: len(BACKENDS)])
def test_many_appends_and_order(tmp_path, use_native):
    path = tmp_path / "many.extpu"
    with ShardWriter(path, use_native=use_native, max_queue_bytes=1 << 16) as w:
        for i in range(50):
            w.append({"x": np.full((128,), i, dtype=np.float32)})
    entries = read_shard(path)
    assert len(entries) == 50
    for i, (_, arrays) in enumerate(entries):
        assert float(arrays["['x']"][0]) == i  # order preserved under backpressure


def test_corrupt_file_rejected(tmp_path):
    p = tmp_path / "bad.extpu"
    p.write_bytes(b"not a shard at all")
    with pytest.raises(ValueError, match="EXTPU1"):
        read_shard(p)


def test_python_writer_surfaces_io_errors(tmp_path):
    """A drain-thread disk error must raise at the producer, not silently
    truncate the shard."""
    from exciting_environments_tpu.io.dataset import _PyAsyncWriter

    w = _PyAsyncWriter(tmp_path / "x.bin", max_queue_bytes=1 << 20)

    class _FailingFile:
        def write(self, buf):
            raise OSError("disk full")

        def close(self):
            pass

    w._f.close()
    w._f = _FailingFile()
    with pytest.raises(OSError, match="IO error"):
        for _ in range(100):
            w.write(b"x" * 1024)
            import time
            time.sleep(0.01)
    with pytest.raises(OSError, match="IO error"):
        w.close()


def test_python_writer_backpressure_bounded(tmp_path):
    """pending() stays within max_queue_bytes (plus one in-flight buffer)."""
    from exciting_environments_tpu.io.dataset import _PyAsyncWriter
    import time

    class _SlowFile:
        def __init__(self, f):
            self._f = f

        def write(self, buf):
            time.sleep(0.002)
            return self._f.write(buf)

        def close(self):
            self._f.close()

    w = _PyAsyncWriter(tmp_path / "slow.bin", max_queue_bytes=4096)
    w._f = _SlowFile(w._f)
    maxima = 0
    for _ in range(30):
        w.write(b"x" * 1024)
        maxima = max(maxima, w.pending())
    assert maxima <= 4096 + 1024, f"backpressure bound violated: {maxima}"
    assert w.close() == 30 * 1024

    # a single oversized buffer is admitted rather than deadlocking
    w2 = _PyAsyncWriter(tmp_path / "big.bin", max_queue_bytes=16)
    w2.write(b"y" * 4096)
    assert w2.close() == 4096


def test_torch_shard_dataset(tmp_path):
    """Shards load as a standard map-style torch dataset; DataLoader batches
    stack records; transform hooks build training pairs."""
    torch = pytest.importorskip("torch")
    from torch.utils.data import DataLoader

    from exciting_environments_tpu.io import ShardWriter, TorchShardDataset

    paths = []
    for s in range(2):
        p = str(tmp_path / f"shard_{s}.extpu")
        with ShardWriter(p, use_native=False) as w:
            for k in range(3):
                w.append(
                    {"obs": np.full((4, 2), 10 * s + k, np.float32),
                     "act": np.full((4, 1), k, np.float32)},
                    name=f"chunk_{k}",
                )
        paths.append(p)

    with TorchShardDataset(paths) as ds:
        assert len(ds) == 6
        assert ds.names[0] == "chunk_0" and len(ds.names) == 6
        item = ds[4]  # shard 1, record 1
        assert isinstance(item["obs"], torch.Tensor)
        assert item["obs"].shape == (4, 2) and float(item["obs"][0, 0]) == 11.0

        batches = list(DataLoader(ds, batch_size=3, shuffle=False))
        assert len(batches) == 2
        assert batches[0]["obs"].shape == (3, 4, 2)
        np.testing.assert_array_equal(
            batches[0]["act"][:, 0, 0].numpy(), np.asarray([0.0, 1.0, 2.0], np.float32)
        )

    def pair(name, tensors):
        return tensors["obs"], tensors["act"]

    with TorchShardDataset(paths[0], transform=pair) as ds2:
        x, y = ds2[0]
        assert x.shape == (4, 2) and y.shape == (4, 1)


def test_torch_dataset_is_picklable_for_spawned_workers(tmp_path):
    """DataLoader workers under spawn/forkserver pickle the dataset: only
    paths/transform are carried, shard mmaps reopen in the new process."""
    import pickle

    pytest.importorskip("torch")
    from exciting_environments_tpu.io import ShardWriter, TorchShardDataset

    p = str(tmp_path / "shard.extpu")
    with ShardWriter(p, use_native=False) as w:
        w.append({"obs": np.arange(8, dtype=np.float32).reshape(4, 2)}, name="c0")

    with TorchShardDataset(p) as ds:
        clone = pickle.loads(pickle.dumps(ds))
        try:
            assert len(clone) == len(ds) == 1
            np.testing.assert_array_equal(
                clone[0]["obs"].numpy(), ds[0]["obs"].numpy()
            )
            assert clone.names == ds.names
        finally:
            clone.close()
