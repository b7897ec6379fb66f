"""Self-describing binary shards for trajectory pytrees.

Format (little-endian):
  magic ``EXTPU1\\n`` | uint64 header_len | header JSON | raw leaf bytes...

The header records, per appended pytree: the leaf key paths, dtypes, shapes
and byte offsets, so :func:`read_shard` can rebuild plain dicts without any
framework imports.  Writing goes through the native asynchronous writer
(C++ background thread, bounded queue) when a toolchain is available, else
a Python-thread fallback with identical behavior.
"""

from __future__ import annotations

import json
import queue
import struct
import threading

import numpy as np
import jax

from exciting_environments_tpu.io import native as _native

MAGIC = b"EXTPU1\n"


class _PyAsyncWriter:
    """Python-thread fallback mirroring the native writer's semantics:
    bounded in-flight bytes (producer blocks past ``max_queue_bytes``) and
    drain-thread IO errors re-raised at the next ``write``/``close``."""

    def __init__(self, path, max_queue_bytes):
        self._f = open(path, "wb")
        self._q = queue.Queue()
        self._max = max_queue_bytes
        self._pending = 0
        self._error = None
        self._cond = threading.Condition()
        self._written = 0
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            buf = self._q.get()
            if buf is None:
                return
            try:
                self._f.write(buf)
            except OSError as exc:
                with self._cond:
                    self._error = exc
                    self._pending = 0
                    self._cond.notify_all()
                return
            with self._cond:
                self._pending -= len(buf)
                self._written += len(buf)
                self._cond.notify_all()

    def write(self, data: bytes):
        with self._cond:
            # backpressure: block until the disk catches up (or the drain
            # thread reports an error); a single buffer larger than the
            # bound is admitted once the queue is drained
            while self._error is None and self._pending > 0 and self._pending + len(data) > self._max:
                self._cond.wait()
            if self._error is not None:
                raise OSError("shard writer hit an IO error") from self._error
            self._pending += len(data)
        self._q.put(data)

    def close(self) -> int:
        self._q.put(None)
        self._thread.join()
        self._f.close()
        if self._error is not None:
            raise OSError("shard writer hit an IO error") from self._error
        return self._written

    def pending(self) -> int:
        with self._cond:
            return self._pending


class _NativeWriter:
    def __init__(self, path, max_queue_bytes):
        self._lib = _native.load_native()
        self._h = self._lib.shard_writer_open(str(path).encode(), max_queue_bytes)
        if not self._h:
            raise OSError(f"cannot open shard {path!r}")
        self._closed = False

    def write(self, data: bytes):
        rc = self._lib.shard_writer_write(self._h, data, len(data))
        if rc != 0:
            raise OSError("shard writer rejected data (closing or IO error)")

    def close(self) -> int:
        if self._closed:
            return 0
        self._closed = True
        written = self._lib.shard_writer_close(self._h)
        if written == 2**64 - 1:
            raise OSError("shard writer hit an IO error")
        return written

    def pending(self) -> int:
        return self._lib.shard_writer_pending(self._h)


class ShardWriter:
    """Stream trajectory pytrees into one binary shard, asynchronously.

    Usage::

        with ShardWriter("run0.extpu") as w:
            for _ in range(n_rollouts):
                traj, state = collector.collect(state, next_signal())
                w.append(traj)          # device->host + enqueue; disk IO
                                        # overlaps the next rollout

    Args:
        path: output file.
        max_queue_bytes: bound on in-flight buffered bytes (a producer
            appending past it blocks until the disk catches up).
        use_native: force the native/Python backend (default: native when a
            C++ toolchain is available).
    """

    def __init__(self, path, max_queue_bytes: int = 1 << 30, use_native: bool = None):
        if use_native is None:
            use_native = _native.native_available()
        self.native = bool(use_native)
        self._writer = (_NativeWriter if self.native else _PyAsyncWriter)(path, max_queue_bytes)
        self._entries = []
        self._data_offset = 0
        self._closed = False
        self._written = 0
        # leading magic streams immediately; the header travels in a footer so
        # payloads never need re-buffering
        self._writer.write(MAGIC)

    def append(self, tree, name: str = None):
        """Append one pytree (e.g. a ``TrajectoryBatch``); leaves are fetched
        to host and enqueued for background writing."""
        leaves = []
        for keypath, leaf in jax.tree_util.tree_leaves_with_path(tree):
            arr = np.ascontiguousarray(jax.device_get(leaf))
            leaves.append(
                {
                    "path": jax.tree_util.keystr(keypath),
                    "dtype": str(arr.dtype),
                    "shape": list(arr.shape),
                    "offset": self._data_offset,
                    "nbytes": int(arr.nbytes),
                }
            )
            self._writer.write(arr.tobytes())
            self._data_offset += arr.nbytes
        self._entries.append({"name": name or f"entry_{len(self._entries)}", "leaves": leaves})

    @property
    def pending_bytes(self) -> int:
        return self._writer.pending()

    def close(self) -> int:
        """Write the footer (header JSON + its length + magic), flush, return
        total bytes written.  Idempotent."""
        if self._closed:
            return self._written
        self._closed = True
        header = json.dumps({"entries": self._entries}).encode()
        self._writer.write(header)
        self._writer.write(struct.pack("<Q", len(header)))
        self._writer.write(MAGIC)
        self._written = self._writer.close()
        return self._written

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_shard(path):
    """Load a shard written by :class:`ShardWriter`.

    Returns a list of ``(name, {leaf_path: np.ndarray})`` in append order.
    The format logic lives in :class:`~exciting_environments_tpu.io.loader
    .ShardIndex` (single source of truth; imported lazily — loader depends
    on this module for ``MAGIC``).
    """
    from exciting_environments_tpu.io.loader import read_shard_lazy

    return list(read_shard_lazy(path))
