"""Fixed-shape batching over fused numpy arrays.

Replaces torch's DataLoader (rec_pangu/dataset/process_data.py:18-20): instead
of per-row collation in worker processes, batches are contiguous array slices
— the whole dataset is already encoded — so the host-side cost per step is one
fancy-index, and every batch is a small pytree ready for a single host->TPU
transfer.

``drop_last=False`` keeps the reference's semantics (all rows contribute to
metrics); the final partial batch triggers at most one extra XLA compilation.
"""
from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int = 512 * 3,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 1029,
        shard_rank: int = 0,
        num_shards: int = 1,
    ):
        """``shard_rank``/``num_shards`` give per-host input sharding
        (SURVEY.md §2.6): each host iterates its strided slice of the rows
        with an identical shuffle order (same seed across hosts)."""
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.shard_rank = int(shard_rank)
        self.num_shards = int(num_shards)
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    def _shard_size(self) -> int:
        n = len(self.dataset)
        return len(range(self.shard_rank, n, self.num_shards))

    def __len__(self) -> int:
        n = self._shard_size()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        # Sequence datasets resample their training windows each epoch.
        if hasattr(self.dataset, "resample"):
            self.dataset.resample(self._epoch)
        self._epoch += 1
        arrays = self.dataset.arrays
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(idx)
        if self.num_shards > 1:
            idx = idx[self.shard_rank :: self.num_shards]
        n = len(idx)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            sel = idx[start : start + self.batch_size]
            yield {k: v[sel] for k, v in arrays.items()}
