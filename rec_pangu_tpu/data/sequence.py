"""Sequence-recall datasets (session/sequence protocols).

Parity targets:
* SequenceDataset   <- rec_pangu/dataset/sequence_dataset.py:11-129
  - train: random split point ``k ~ U[4, len)`` per user per epoch, history is
    the (up to) ``max_length`` items before k, target is item[k], plus the next
    ``next_seq_length`` future items (sequence_dataset.py:63-85);
  - test: fixed split point ``k = int(0.8 * len)`` (sequence_dataset.py:98);
  - ground truth: the last 20%% of each user's list (sequence_dataset.py:123-129).
* SequenceDatasetV2 <- rec_pangu/dataset/sequence_dataset.py:132-212
  leave-one-out: train target at ``len-3``, valid ``len-2``, test ``len-1``;
  ground truth is the single held-out item (sequence_dataset.py:136-145).

TPU-native departure: the reference draws the random window inside a per-row
``__getitem__`` (host RNG per sample).  Here the whole epoch's windows are
materialized up front into fused ``[U, L]`` arrays (``resample`` is invoked by
the DataLoader at epoch start), so batches have static shapes and zero
per-step Python cost.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from .encoder import OOV_SENTINEL, fit_sequence_enc_dict


class SequenceDataset:
    def __init__(self, config: dict, df: pd.DataFrame, enc_dict: Optional[dict] = None,
                 phase: str = "train", seed: int = 1029):
        self.config = config
        self.max_length = int(config["max_length"])
        self.user_col = config["user_col"]
        self.item_col = config["item_col"]
        self.time_col = config.get("time_col", None)
        self.cate_cols = list(config.get("cate_cols", []) or [])
        self.next_seq_length = int(config.get("next_seq_length", 10))
        self.phase = phase
        self._rng = np.random.default_rng(seed)

        df = df.copy()
        if self.time_col:
            df = df.sort_values(by=[self.user_col, self.time_col], kind="mergesort")

        self.enc_dict = enc_dict if enc_dict is not None else fit_sequence_enc_dict(df, config)
        for f in [self.item_col] + self.cate_cols:
            mapping = {k: v for k, v in self.enc_dict[f].items() if k != OOV_SENTINEL}
            df[f] = df[f].astype(str).map(mapping).fillna(0).astype(np.int64)

        grouped = df.groupby(self.user_col, sort=False)
        self.user2item: Dict = grouped[self.item_col].apply(list).to_dict()
        self.user2cate = {c: grouped[c].apply(list).to_dict() for c in self.cate_cols}
        self.user_list = df[self.user_col].unique()
        self._item_lists: List[np.ndarray] = [
            np.asarray(self.user2item[u], dtype=np.int64) for u in self.user_list
        ]
        self._cate_lists = {
            c: [np.asarray(self.user2cate[c][u], dtype=np.int64) for u in self.user_list]
            for c in self.cate_cols
        }
        # flat layout for the native window builder
        lens = np.asarray([len(x) for x in self._item_lists], dtype=np.int64)
        self._offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        self._flat_items = (np.concatenate(self._item_lists).astype(np.int64)
                            if len(self._item_lists) else np.zeros(0, np.int64))
        self._flat_cates = {
            c: (np.concatenate(self._cate_lists[c]).astype(np.int64)
                if self._cate_lists[c] else np.zeros(0, np.int64))
            for c in self.cate_cols
        }

        self.arrays: Dict[str, np.ndarray] = {}
        self._built_epoch: Optional[int] = None
        if self.phase == "train":
            self.resample(0)
        else:
            self._build(self._eval_split_points())

    # -- split-point policies (overridden by V2) --------------------------------
    def _train_split_points(self) -> np.ndarray:
        ks = np.empty(len(self._item_lists), dtype=np.int64)
        for i, items in enumerate(self._item_lists):
            n = len(items)
            # reference: random.choice(range(4, n)) — requires n > 4
            ks[i] = self._rng.integers(4, n) if n > 4 else max(1, n - 1)
        return ks

    def _eval_split_points(self) -> np.ndarray:
        return np.array([int(0.8 * len(x)) for x in self._item_lists], dtype=np.int64)

    def resample(self, epoch: int) -> None:
        """Rebuild training windows; idempotent per epoch so the trainer's
        sample-batch peek doesn't pay the build cost twice."""
        if self.phase != "train" or epoch == self._built_epoch:
            return
        self._built_epoch = epoch
        self._build(self._train_split_points())

    def _window(self, seq: np.ndarray, k: int) -> np.ndarray:
        L = self.max_length
        out = np.zeros((L,), dtype=np.int64)
        if k >= L:
            out[:] = seq[k - L : k]
        else:
            out[:k] = seq[:k]
        return out

    def _build(self, ks: np.ndarray) -> None:
        from ..native import get_lib

        lib = get_lib()
        if lib is not None:
            self._build_native(lib, ks)
        else:
            self._build_python(ks)
        if self.phase != "train":
            self.arrays["user"] = np.asarray(
                [str(u) for u in self.user_list], dtype=object)

    def _build_native(self, lib, ks: np.ndarray) -> None:
        import ctypes

        U, L, S = len(self._item_lists), self.max_length, self.next_seq_length
        hist = np.zeros((U, L), dtype=np.int32)
        mask = np.zeros((U, L), dtype=np.float32)
        target = np.zeros((U,), dtype=np.int32)
        nxt = np.zeros((U, S), dtype=np.int32)
        nmask = np.zeros((U, S), dtype=np.float32)
        ks = np.ascontiguousarray(ks, dtype=np.int64)

        def ptr(a, t):
            return a.ctypes.data_as(ctypes.POINTER(t))

        i64, i32, f32 = ctypes.c_int64, ctypes.c_int32, ctypes.c_float
        lib.build_windows(
            ptr(self._flat_items, i64), ptr(self._offsets, i64), ptr(ks, i64),
            U, L, S, ptr(hist, i32), ptr(mask, f32), ptr(target, i32),
            ptr(nxt, i32), ptr(nmask, f32), 1 if self.phase == "train" else 0,
        )
        arrays: Dict[str, np.ndarray] = {
            "hist_item_list": hist, "hist_mask_list": mask}
        for c in self.cate_cols:
            ch = np.zeros((U, L), dtype=np.int32)
            lib.build_cate_windows(ptr(self._flat_cates[c], i64),
                                   ptr(self._offsets, i64), ptr(ks, i64),
                                   U, L, ptr(ch, i32))
            arrays[f"hist_{c}_list"] = ch
        if self.phase == "train":
            arrays["target_item"] = target
            arrays["next_item_list"] = nxt
            arrays["next_mask_list"] = nmask
        self.arrays = arrays

    def _build_python(self, ks: np.ndarray) -> None:
        U, L = len(self._item_lists), self.max_length
        hist = np.zeros((U, L), dtype=np.int32)
        mask = np.zeros((U, L), dtype=np.float32)
        for i, (items, k) in enumerate(zip(self._item_lists, ks)):
            k = int(k)
            hist[i] = self._window(items, k)
            mask[i, : min(k, L)] = 1.0
        arrays: Dict[str, np.ndarray] = {
            "hist_item_list": hist,
            "hist_mask_list": mask,
        }
        for c in self.cate_cols:
            ch = np.zeros((U, L), dtype=np.int32)
            for i, (seq, k) in enumerate(zip(self._cate_lists[c], ks)):
                ch[i] = self._window(seq, int(k))
            arrays[f"hist_{c}_list"] = ch

        if self.phase == "train":
            target = np.zeros((U,), dtype=np.int32)
            nxt = np.zeros((U, self.next_seq_length), dtype=np.int32)
            nmask = np.zeros((U, self.next_seq_length), dtype=np.float32)
            for i, (items, k) in enumerate(zip(self._item_lists, ks)):
                k = int(k)
                target[i] = items[min(k, len(items) - 1)]
                fut = items[k : k + self.next_seq_length]
                nxt[i, : len(fut)] = fut
                nmask[i, : len(fut)] = 1.0
            arrays["target_item"] = target
            arrays["next_item_list"] = nxt
            arrays["next_mask_list"] = nmask
        self.arrays = arrays

    def __len__(self) -> int:
        return len(self.user_list)

    def get_test_gd(self) -> Dict[str, List[int]]:
        gd = {}
        for u, items in zip(self.user_list, self._item_lists):
            k = int(0.8 * len(items))
            gd[str(u)] = [int(x) for x in items[k:]]
        return gd

    @property
    def item_vocab_size(self) -> int:
        return int(self.enc_dict[self.item_col][OOV_SENTINEL])


class SequenceDatasetV2(SequenceDataset):
    """Leave-one-out protocol (train at len-3, valid at len-2, test at len-1)."""

    def _train_split_points(self) -> np.ndarray:
        return np.array([max(1, len(x) - 3) for x in self._item_lists], dtype=np.int64)

    def _eval_split_points(self) -> np.ndarray:
        delta = 2 if self.phase == "valid" else 1
        return np.array([max(1, len(x) - delta) for x in self._item_lists], dtype=np.int64)

    def get_test_gd(self) -> Dict[str, List[int]]:
        delta = 2 if self.phase == "valid" else 1
        return {
            str(u): [int(items[len(items) - delta])]
            for u, items in zip(self.user_list, self._item_lists)
        }


def seq_collate(batch):
    """Stack (hist_items, hist_mask, target) samples into batch arrays.

    Parity: rec_pangu/dataset/sequence_dataset.py:215-225 (``seq_collate``).
    The loaders here emit fixed-shape numpy batches directly, so this helper
    exists for API compatibility with code that collates per-sample tuples —
    e.g. custom eval loops ported from the reference.  Returns
    (hist_item [B, L] int64, hist_mask [B, L] int64, target list of len B).
    """
    hist_item = np.stack([np.asarray(s[0]) for s in batch]).astype(np.int64)
    hist_mask = np.stack([np.asarray(s[1]) for s in batch]).astype(np.int64)
    item_list = [s[2] for s in batch]
    return hist_item, hist_mask, item_list
