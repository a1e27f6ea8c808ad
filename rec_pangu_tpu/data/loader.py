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
    ):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
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
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            sel = idx[start : start + self.batch_size]
            yield {k: v[sel] for k, v in arrays.items()}
