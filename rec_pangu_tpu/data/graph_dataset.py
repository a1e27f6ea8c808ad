"""Graph-CF dataset (parity: rec_pangu/dataset/graph_dataset.py:7-104).

BPR-style pos/neg sampling over a bipartite user-item graph.  The DGL graph
is replaced by a dense degree-normalized interaction matrix ``R_norm [U, I]``
(``R_norm[u,i] = count(u,i) * deg_u^-1/2 * deg_i^-1/2``) — the bipartite
adjacency's only non-zero block — so NGCF's message passing becomes two
MXU matmuls instead of sparse scatter ops.
"""
from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd


class GeneralGraphDataset:
    def __init__(self, df: pd.DataFrame, num_user: int, num_item: int,
                 phase: str = "train", seed: int = 1029):
        self.df = df
        self.num_user = int(num_user)
        self.num_item = int(num_item)
        self.phase = phase
        self._rng = np.random.default_rng(seed)
        self.test_gd = df.groupby("user_id")["item_id"].apply(list).to_dict()
        self.user_list = list(self.test_gd.keys())
        self.user_ids = df["user_id"].to_numpy(np.int32)
        self.item_ids = df["item_id"].to_numpy(np.int32)

    def generate_graph(self) -> np.ndarray:
        """Dense normalized interaction matrix R_norm [U, I] (float32)."""
        R = np.zeros((self.num_user, self.num_item), dtype=np.float32)
        np.add.at(R, (self.user_ids, self.item_ids), 1.0)
        deg_u = R.sum(axis=1)
        deg_i = R.sum(axis=0)
        nu = np.where(deg_u > 0, deg_u**-0.5, 0.0)[:, None]
        ni = np.where(deg_i > 0, deg_i**-0.5, 0.0)[None, :]
        return R * nu * ni

    def sample(self, batch_size: int = 1024) -> Dict[str, np.ndarray]:
        """One BPR batch: a user, one of their items, one negative item."""
        users = self._rng.choice(len(self.user_list), size=batch_size,
                                 replace=batch_size > len(self.user_list))
        users = np.asarray([self.user_list[i] for i in users], dtype=np.int64)
        pos = np.asarray([
            self.test_gd[u][self._rng.integers(0, len(self.test_gd[u]))]
            for u in users], dtype=np.int64)
        neg = self._rng.integers(0, self.num_item, size=batch_size)
        for i, u in enumerate(users):  # rejection resample collisions
            seen = set(self.test_gd[u])
            while int(neg[i]) in seen:
                neg[i] = self._rng.integers(0, self.num_item)
        return {
            "user_id": users.astype(np.int32),
            "pos_item_id": pos.astype(np.int32),
            "neg_item_id": neg.astype(np.int32),
        }

    def __len__(self) -> int:
        if self.phase == "train":
            return len(self.df)
        return len(self.user_list)
