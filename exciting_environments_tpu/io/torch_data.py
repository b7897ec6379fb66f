"""PyTorch interop for collected shards.

Datasets collected at kernel speed (``RolloutCollector`` → ``ShardWriter``)
are routinely consumed by torch training stacks (system identification,
world models, offline RL).  :class:`TorchShardDataset` exposes one or more
``.extpu`` shards as a standard map-style ``torch.utils.data.Dataset`` —
footer-only indexing, so opening a multi-gigabyte shard costs one mmap, and
each ``__getitem__`` materializes exactly one record.

No torch dependency is imported until the class is instantiated; the rest
of the package stays torch-free.

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
        import torch  # deferred: keep the package importable without torch

        self._torch = torch
        if isinstance(paths, (str, bytes)) or not hasattr(paths, "__iter__"):
            paths = [paths]
        self._indices = [ShardIndex(p) for p in paths]
        self._offsets = []  # (shard_idx, local_idx) per global record
        for si, idx in enumerate(self._indices):
            self._offsets.extend((si, li) for li in range(len(idx)))
        self.transform = transform

    def __len__(self):
        return len(self._offsets)

    def __getitem__(self, i):
        si, li = self._offsets[i]
        name, arrays = self._indices[si].entry(li)
        tensors = {
            _pretty_key(k): self._torch.from_numpy(np.array(v))  # copy: map is read-only
            for k, v in arrays.items()
        }
        if self.transform is not None:
            return self.transform(name, tensors)
        return tensors

    @property
    def names(self):
        """Record names in global order (``chunk_000001``, ...)."""
        return [self._indices[si].names[li] for si, li in self._offsets]

    def close(self):
        for idx in self._indices:
            idx.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
