"""Reader-side data pipeline: shard -> host -> device prefetching.

Completes the dataset story started by :class:`~exciting_environments_tpu.io
.dataset.ShardWriter`: training/sysid consumers need trajectory batches ON
DEVICE the moment the previous step finishes, not after a synchronous
read + transfer.  Two layers:

- :func:`read_shard_lazy` / :class:`ShardIndex` — parse only the footer
  (header JSON) of a shard and memory-map the payload, so opening a
  multi-gigabyte shard costs a few kilobytes of IO and arrays are
  zero-copy views until touched.
- :class:`DeviceLoader` — a double-buffered iterator: a background thread
  walks the shard entries, optionally applies a host-side ``transform``,
  and dispatches ``jax.device_put`` (async under XLA) so the host->HBM DMA
  of batch ``i+1``/``i+2`` overlaps the device compute consuming batch
  ``i``.  With a ``sharding`` the put scatters each leaf straight onto a
  :class:`jax.sharding.Mesh` — the multi-chip ingest path.

The reference ships no equivalent (its notebooks save ``.npy`` files and
reload them synchronously, ``examples/env_data_generation.ipynb``); this is
the TPU-native replacement for that workflow.
"""

from __future__ import annotations

import json
import mmap
import queue
import re
import struct
import threading

import numpy as np
import jax

from exciting_environments_tpu.io.dataset import MAGIC


#: leaf paths are jax keystr strings; a flat-dict record's "['obs']" reads
#: better as plain "obs" (nested pytree paths keep the full keystr)
_SIMPLE_KEY = re.compile(r"^\['([^'\[\]]+)'\]$")


def pretty_leaf_key(path: str) -> str:
    """Human-friendly leaf key: ``"['obs']"`` -> ``"obs"``; nested pytree
    paths are returned unchanged."""
    m = _SIMPLE_KEY.match(path)
    return m.group(1) if m else path


class ShardIndex:
    """Footer-only view of one shard: entry names + zero-copy leaf arrays.

    The file is memory-mapped; ``entry(i)`` returns numpy views into the
    map (no copies).  Keep the index alive while views are in use.
    """

    def __init__(self, path):
        self.path = str(path)
        self._f = open(path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        n = len(self._mm)
        tail = len(MAGIC) + 8
        if n < len(MAGIC) + tail or self._mm[: len(MAGIC)] != MAGIC or self._mm[n - len(MAGIC) :] != MAGIC:
            raise ValueError(f"{path!r} is not a (complete) EXTPU1 shard")
        (header_len,) = struct.unpack("<Q", self._mm[n - tail : n - len(MAGIC)])
        header_start = n - tail - header_len
        self._entries = json.loads(self._mm[header_start : header_start + header_len])["entries"]
        self._base = len(MAGIC)

    def __len__(self):
        return len(self._entries)

    @property
    def names(self):
        return [e["name"] for e in self._entries]

    def entry(self, i: int):
        """Return ``(name, {leaf_path: np.ndarray})`` for entry ``i`` as
        zero-copy views into the mapped file."""
        e = self._entries[i]
        arrays = {}
        for leaf in e["leaves"]:
            start = self._base + leaf["offset"]
            arrays[leaf["path"]] = np.frombuffer(
                self._mm, dtype=np.dtype(leaf["dtype"]), count=int(np.prod(leaf["shape"], dtype=np.int64)), offset=start
            ).reshape(leaf["shape"])
        return e["name"], arrays

    def __iter__(self):
        for i in range(len(self)):
            yield self.entry(i)

    def close(self):
        # the mmap holds its own fd reference and outstanding views keep the
        # map alive; release our handles and let the last view unmap it
        self._f.close()
        try:
            self._mm.close()
        except BufferError:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_shard_lazy(path):
    """Iterate ``(name, arrays)`` over a shard without loading it whole."""
    with ShardIndex(path) as idx:
        for name, arrays in idx:
            # materialize copies so the map can close
            yield name, {k: np.array(v) for k, v in arrays.items()}


class DeviceLoader:
    """Double-buffered shard -> device prefetcher.

    Iterates ``(name, {leaf_path: jax.Array})`` over every entry of every
    shard in ``paths``, in order.  A background thread stays ``prefetch``
    entries ahead: it decodes the next entries and dispatches their
    ``jax.device_put`` immediately, so the host->device transfer runs while
    the caller's device computation is still consuming the current batch.

    Args:
        paths: shard files (written by :class:`ShardWriter`), consumed in
            the given order.
        prefetch: how many entries may be in flight beyond the one the
            caller holds (2 = classic double buffering).
        sharding: optional :class:`jax.sharding.Sharding` (or device) each
            leaf is put with — pass a ``NamedSharding`` over a mesh to
            scatter batches for ``ShardedEnv``/``shard_map`` consumers.
            Leaves whose shape the sharding cannot tile (e.g. small metadata
            vectors) are replicated instead.  A callable
            ``(leaf_path, array) -> sharding-or-None`` gives per-leaf
            control.
        transform: optional host-side ``f(name, arrays) -> arrays`` hook
            (dtype casts, layout tweaks) applied before the device put.

    Background-thread errors re-raise in the consumer at the equivalent
    ``next()`` call.
    """

    def __init__(self, paths, prefetch: int = 2, sharding=None, transform=None):
        if prefetch < 1:
            raise ValueError("prefetch must be >= 1")
        self.paths = [str(p) for p in paths]
        self.prefetch = int(prefetch)
        self.sharding = sharding
        self.transform = transform

    def _put(self, key, arr):
        s = self.sharding(key, arr) if callable(self.sharding) else self.sharding
        if s is None:
            return jax.device_put(arr)
        try:
            return jax.device_put(arr, s)
        except ValueError:
            # sharding can't tile this leaf (e.g. a (3,) metadata vector on
            # an 8-way batch axis) — replicate it instead
            if isinstance(s, jax.sharding.NamedSharding):
                return jax.device_put(arr, jax.sharding.NamedSharding(s.mesh, jax.sharding.PartitionSpec()))
            return jax.device_put(arr)

    def __iter__(self):
        q = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(item):
            """Bounded put that gives up when the consumer is gone — every
            worker put must go through this, or an abandoned iterator leaves
            the thread blocked forever, pinning its prefetched device
            batches in HBM."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return
                except queue.Full:
                    continue

        def worker():
            try:
                for path in self.paths:
                    with ShardIndex(path) as idx:
                        for name, arrays in idx:
                            if stop.is_set():
                                return
                            if self.transform is not None:
                                arrays = self.transform(name, arrays)
                            # dispatch the async host->device copy NOW; the
                            # queue hands the caller an already-in-flight batch
                            batch = {k: self._put(k, np.ascontiguousarray(v)) for k, v in arrays.items()}
                            put_or_stop((name, batch))
                put_or_stop(None)
            except BaseException as exc:  # propagate to the consumer
                put_or_stop(exc)

        thread = threading.Thread(target=worker, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()

    def __len__(self):
        total = 0
        for p in self.paths:
            with ShardIndex(p) as idx:
                total += len(idx)
        return total
