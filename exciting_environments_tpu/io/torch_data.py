"""PyTorch interop for collected shards.

Datasets collected at kernel speed (``RolloutCollector`` → ``ShardWriter``)
are routinely consumed by torch training stacks (system identification,
world models, offline RL).  :class:`TorchShardDataset` exposes one or more
``.extpu`` shards as a standard map-style ``torch.utils.data.Dataset`` —
footer-only indexing, so opening a multi-gigabyte shard costs one mmap, and
each ``__getitem__`` materializes exactly one record.

No torch dependency is imported until the class is instantiated; the rest
of the package stays torch-free.  The dataset is picklable (only paths and
the transform are carried; shard mmaps reopen lazily per process), so
``DataLoader(num_workers>0)`` works under every multiprocessing start
method — spawn and forkserver included, not just Linux fork.

Example::

    from torch.utils.data import DataLoader
    from exciting_environments_tpu.io import TorchShardDataset

    ds = TorchShardDataset(["fleet_0.extpu", "fleet_1.extpu"])
    for batch in DataLoader(ds, batch_size=32, shuffle=True):
        batch["final_obs"]  # torch.Tensor, stacked over records
"""

from __future__ import annotations

import numpy as np

from exciting_environments_tpu.io.loader import ShardIndex, pretty_leaf_key as _pretty_key


class TorchShardDataset:
    """Map-style torch dataset over ``.extpu`` shards.

    Each item is ``{leaf_path: torch.Tensor}`` for one written record (one
    ``ShardWriter.append`` call, e.g. a fleet chunk).  Tensors are copies:
    the shard map is read-only, and copies are required anyway once a
    ``DataLoader`` ships items across worker processes.

    Args:
        paths: one shard path or a list (records are concatenated in order).
        transform: optional ``transform(name, tensors) -> item`` applied per
            record (e.g. select/reshape leaves, build (input, target) pairs).
    """

    def __init__(self, paths, transform=None):
        import torch  # noqa: F401  deferred probe: fail at construction, not first item

        if isinstance(paths, (str, bytes)) or not hasattr(paths, "__iter__"):
            paths = [paths]
        self._paths = list(paths)
        self.transform = transform
        self._open()

    def _open(self):
        self._indices = [ShardIndex(p) for p in self._paths]
        self._offsets = []  # (shard_idx, local_idx) per global record
        for si, idx in enumerate(self._indices):
            self._offsets.extend((si, li) for li in range(len(idx)))

    # mmap handles and the torch module are unpicklable; carry only the
    # construction args and reopen in the receiving process (DataLoader
    # workers under spawn/forkserver pickle the dataset)
    def __getstate__(self):
        return {"_paths": self._paths, "transform": self.transform}

    def __setstate__(self, state):
        self._paths = state["_paths"]
        self.transform = state["transform"]
        self._open()

    def __len__(self):
        return len(self._offsets)

    def __getitem__(self, i):
        import torch

        si, li = self._offsets[i]
        name, arrays = self._indices[si].entry(li)
        tensors = {
            _pretty_key(k): torch.from_numpy(np.array(v))  # copy: map is read-only
            for k, v in arrays.items()
        }
        if self.transform is not None:
            return self.transform(name, tensors)
        return tensors

    @property
    def names(self):
        """Record names in global order (``chunk_000001``, ...)."""
        per_shard = [idx.names for idx in self._indices]
        return [per_shard[si][li] for si, li in self._offsets]

    def close(self):
        for idx in self._indices:
            idx.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
