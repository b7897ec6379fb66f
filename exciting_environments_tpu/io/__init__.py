"""Dataset IO: native asynchronous shard writing for trajectory batches.

Fleet-scale collection produces multi-gigabyte :class:`TrajectoryBatch`
pytrees per rollout; persisting them must not stall the device pipeline.
:class:`ShardWriter` streams pytrees into a simple self-describing binary
shard format through a **C++ background writer thread** (bounded queue, see
``native/shard_writer.cpp``) so serialization overlaps the next rollout.
If no C++ toolchain is available the same API falls back to a Python-thread
writer.

Reading back, :class:`DeviceLoader` completes the pipeline: footer-only
shard indexing with memory-mapped payloads plus a double-buffered
background thread that stages each entry onto device (optionally scattered
over a mesh sharding) while the consumer is still computing on the
previous one.
"""

from exciting_environments_tpu.io.dataset import ShardWriter, read_shard
from exciting_environments_tpu.io.loader import DeviceLoader, ShardIndex, read_shard_lazy


def __getattr__(name):
    # torch interop imports torch lazily; the core io package stays torch-free
    if name == "TorchShardDataset":
        from exciting_environments_tpu.io.torch_data import TorchShardDataset

        return TorchShardDataset
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
