"""Feature encoding: schema -> enc_dict -> fused fixed-shape arrays.

Behavioral parity with the reference (rec_pangu/dataset/base_dataset.py:47-103):

* sparse column: values cast to str, sorted unique -> ids ``0..n-1``;
  ``enc_dict[col]['vocab_size'] = n``; out-of-vocabulary values map to ``n``
  (so embedding tables need ``n + 1`` rows, cf. rec_pangu/models/layers/embedding.py:31-34).
* dense column: min/max recorded; encoding is ``(x - min) / (max - min + 1e-5)``
  (rec_pangu/dataset/base_dataset.py:79-80).
* sequence vocabularies (rec_pangu/dataset/sequence_dataset.py:37-54): ids ``1..n``
  with 0 reserved for padding/OOV and ``vocab_size = n + 1``.

TPU-native departure: instead of a dict of per-feature tensors the encoder
emits **fused arrays** — all sparse ids packed into one ``[N, F] int32`` matrix
and dense values into ``[N, Nd] float32`` — so a batch is a tiny pytree with
static shapes and the model does a single fused embedding gather.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

OOV_SENTINEL = "vocab_size"


def _feature_cols(schema: dict) -> tuple:
    # Deterministic ordering: schema list order (the reference uses list(set(...)),
    # rec_pangu/dataset/base_dataset.py:38-39, which is nondeterministic — we fix that).
    dense = list(dict.fromkeys(schema.get("dense_cols", []) or []))
    sparse = list(dict.fromkeys(schema.get("sparse_cols", []) or []))
    return dense, sparse


def fit_enc_dict(df: pd.DataFrame, schema: dict) -> Dict[str, dict]:
    """Fit a ranking/multitask enc_dict on a (train) dataframe."""
    dense_cols, sparse_cols = _feature_cols(schema)
    enc_dict: Dict[str, dict] = {}
    for f in dense_cols:
        col = pd.to_numeric(df[f])
        enc_dict[f] = {"min": col.min(), "max": col.max()}
    for f in sparse_cols:
        vals = df[f].astype(str)
        uniques = sorted(vals.unique())
        mapping = dict(zip(uniques, range(len(uniques))))
        mapping[OOV_SENTINEL] = len(uniques)
        enc_dict[f] = mapping
    return enc_dict


def fit_sequence_enc_dict(df: pd.DataFrame, schema: dict) -> Dict[str, dict]:
    """Fit a sequence enc_dict: ids 1..n, 0 = padding/OOV, vocab_size = n+1."""
    sparse_cols = [schema["item_col"]] + list(schema.get("cate_cols", []) or [])
    enc_dict: Dict[str, dict] = {}
    for f in sparse_cols:
        vals = df[f].astype(str)
        uniques = sorted(vals.unique())
        mapping = dict(zip(uniques, range(1, 1 + len(uniques))))
        mapping[OOV_SENTINEL] = len(uniques) + 1
        enc_dict[f] = mapping
    return enc_dict


@dataclasses.dataclass(frozen=True)
class FeatureSpec:
    """Static description of the fused feature layout, derived from enc_dict.

    ``sparse_vocab_rows[i]`` is the number of embedding-table rows feature i
    needs (vocab_size + 1 to cover the OOV id, matching the reference's
    ``nn.Embedding(vocab_size + 1, D)``).  ``offsets`` are the row offsets of
    each feature's sub-table inside the fused table.
    """

    sparse_names: tuple
    dense_names: tuple
    sparse_vocab_rows: tuple  # rows per feature in the fused table

    @property
    def num_sparse(self) -> int:
        return len(self.sparse_names)

    @property
    def num_dense(self) -> int:
        return len(self.dense_names)

    @property
    def offsets(self) -> np.ndarray:
        return np.concatenate([[0], np.cumsum(self.sparse_vocab_rows)[:-1]]).astype(np.int32) \
            if self.sparse_vocab_rows else np.zeros((0,), np.int32)

    @property
    def total_rows(self) -> int:
        return int(sum(self.sparse_vocab_rows))

    def feature_slice(self, name: str) -> slice:
        i = self.sparse_names.index(name)
        off = int(self.offsets[i])
        return slice(off, off + int(self.sparse_vocab_rows[i]))

    @staticmethod
    def from_enc_dict(enc_dict: Dict[str, dict], schema: Optional[dict] = None) -> "FeatureSpec":
        if schema is not None:
            dense_cols, sparse_cols = _feature_cols(schema)
        else:
            dense_cols = [c for c, d in enc_dict.items() if "min" in d]
            sparse_cols = [c for c, d in enc_dict.items() if OOV_SENTINEL in d]
        rows = tuple(int(enc_dict[c][OOV_SENTINEL]) + 1 for c in sparse_cols)
        return FeatureSpec(tuple(sparse_cols), tuple(dense_cols), rows)


def encode_sparse_col(values: pd.Series, mapping: dict) -> np.ndarray:
    # vectorized dict-map (C path) with OOV fill, instead of a Python lambda
    oov = mapping[OOV_SENTINEL]
    out = values.astype(str).map(mapping)
    return out.fillna(oov).to_numpy(dtype=np.int32)


def encode_dense_col(values: pd.Series, stats: dict) -> np.ndarray:
    lo, hi = stats["min"], stats["max"]
    return ((pd.to_numeric(values) - lo) / (hi - lo + 1e-5)).to_numpy(dtype=np.float32)


def encode_ranking_df(
    df: pd.DataFrame,
    enc_dict: Dict[str, dict],
    schema: dict,
    label_cols: Optional[List[str]] = None,
) -> Dict[str, np.ndarray]:
    """Encode a dataframe into fused arrays {'sparse':[N,F] i32, 'dense':[N,Nd] f32, 'label':[N(,T)] f32}."""
    spec = FeatureSpec.from_enc_dict(enc_dict, schema)
    n = len(df)
    out: Dict[str, np.ndarray] = {}
    sparse = np.zeros((n, spec.num_sparse), dtype=np.int32)
    for i, col in enumerate(spec.sparse_names):
        sparse[:, i] = encode_sparse_col(df[col], enc_dict[col])
    out["sparse"] = sparse
    dense = np.zeros((n, spec.num_dense), dtype=np.float32)
    for i, col in enumerate(spec.dense_names):
        dense[:, i] = encode_dense_col(df[col], enc_dict[col])
    out["dense"] = dense
    if label_cols:
        present = [c for c in label_cols if c in df.columns]
        if len(present) == len(label_cols):
            labels = np.stack(
                [pd.to_numeric(df[c]).to_numpy(dtype=np.float32) for c in label_cols], axis=1
            )
            out["label"] = labels[:, 0] if len(label_cols) == 1 else labels
    return out
