"""Seed-node batch loaders (the ``thg.loader`` surface the reference's
examples reference).

The reference gets batch parallelism from PyTorch DataLoader workers calling
the sampler per batch (SURVEY §2.5); here batching is a lightweight seed
iterator — sampling itself is an on-device op inside the train step, so
there is nothing to multiprocess.  ``to_csc``/``to_csr`` re-exports mirror
``thg.loader.to_csc(data)`` (examples/neighbor_sampling.py:14).
"""
from __future__ import annotations

from typing import Iterator, Union

import numpy as np

from .data.dataset import Data
from .data.storage import to_csc as _to_csc, to_csr as _to_csr


def to_csc(data: Union[Data, np.ndarray], size=None):
    """``thg.loader.to_csc(data)``: accepts a Data object or raw COO."""
    if isinstance(data, Data):
        return _to_csc(data.edge_index, data.num_nodes)
    return _to_csc(data, size)


def to_csr(data: Union[Data, np.ndarray], size=None):
    if isinstance(data, Data):
        return _to_csr(data.edge_index, data.num_nodes)
    return _to_csr(data, size)


class SeedLoader:
    """Shuffled fixed-size seed-node batches (static shapes for jit).

    ``drop_last`` defaults True so every batch compiles to the same shape;
    the remainder can be handled by a final padded batch (``pad_last``).
    """

    def __init__(self, seeds: np.ndarray, batch_size: int, *,
                 shuffle: bool = True, drop_last: bool = True,
                 pad_last: bool = False, seed: int = 0):
        self.seeds = np.asarray(seeds)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.pad_last = pad_last
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.seeds) // self.batch_size
        if not self.drop_last and len(self.seeds) % self.batch_size:
            n += 1
        return n

    def __iter__(self) -> Iterator[np.ndarray]:
        order = np.arange(len(self.seeds))
        if self.shuffle:
            self._rng.shuffle(order)
        self._epoch += 1
        bs = self.batch_size
        full = len(self.seeds) // bs * bs
        for i in range(0, full, bs):
            yield self.seeds[order[i:i + bs]]
        rem = len(self.seeds) - full
        if rem and not self.drop_last:
            tail = self.seeds[order[full:]]
            if self.pad_last:
                pad = np.resize(tail, bs)
                yield pad
            else:
                yield tail
