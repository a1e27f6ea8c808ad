"""Pretrained-embedding injection.

Parity: BaseModel.set_pretrained_weights (rec_pangu/models/base_model.py:61-90)
+ EmbeddingLayer.set_weights (layers/embedding.py:36-47): build a vocab-aligned
matrix from a {raw_value: vector} dict (random rows for missing values), write
it into the feature's rows, optionally freeze them.

With the fused table the feature's rows live at ``spec.feature_slice(col)``;
freezing is a row-mask applied to optimizer updates (see
``freeze_rows_transform``) instead of requires_grad=False.
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import numpy as np
import optax

from ..data.encoder import OOV_SENTINEL, FeatureSpec


def build_pretrained_matrix(enc_dict: dict, col_name: str,
                            pretrained_dict: Dict[str, np.ndarray],
                            seed: int = 1029) -> np.ndarray:
    """Vocab-aligned [rows, D] matrix (rows = vocab_size + 1 incl. OOV row)."""
    assert col_name in enc_dict, f"Pretrained column {col_name!r} not in enc_dict"
    dim = len(next(iter(pretrained_dict.values())))
    rng = np.random.default_rng(seed)
    rows = int(enc_dict[col_name][OOV_SENTINEL]) + 1
    mat = rng.random((rows, dim), dtype=np.float64).astype(np.float32)
    for value, idx in enc_dict[col_name].items():
        if value == OOV_SENTINEL:
            continue
        vec = pretrained_dict.get(value)
        if vec is not None:
            mat[idx] = np.asarray(vec, dtype=np.float32)
    return mat


def inject_pretrained(params: Any, enc_dict: dict, col_name: str,
                      pretrained_dict: Dict[str, np.ndarray],
                      embedding_dim: int) -> Tuple[Any, List[Tuple[str, slice]]]:
    """Write the pretrained rows into every fused table whose shape matches
    (total_rows, embedding_dim).  Returns (new_params, [(path, row_slice)])."""
    spec = FeatureSpec.from_enc_dict(enc_dict)
    sl = spec.feature_slice(col_name)
    matrix = build_pretrained_matrix(enc_dict, col_name, pretrained_dict)
    assert matrix.shape[1] == embedding_dim, (
        f"Pretrained dim {matrix.shape[1]} != model embedding dim {embedding_dim}")
    touched: List[Tuple[str, slice]] = []

    def visit(path, leaf):
        names = [getattr(p, "key", None) for p in path]
        if names and names[-1] == "table" and getattr(leaf, "ndim", 0) == 2 \
                and leaf.shape == (spec.total_rows, embedding_dim):
            touched.append(("/".join(str(n) for n in names), sl))
            return leaf.at[sl.start : sl.stop].set(matrix)
        return leaf

    new_params = jax.tree_util.tree_map_with_path(visit, params)
    assert touched, "No fused embedding table matched the pretrained injection"
    return new_params, touched


def freeze_rows_transform(frozen: List[Tuple[str, slice]]) -> optax.GradientTransformation:
    """Zero optimizer updates for frozen (path, row-slice) table regions —
    the functional equivalent of requires_grad=False on those rows."""
    paths = {p: sl for p, sl in frozen}

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        def visit(path, u):
            key = "/".join(str(getattr(p, "key", p)) for p in path)
            sl = paths.get(key)
            if sl is not None:
                return u.at[sl.start : sl.stop].set(0.0)
            return u

        return jax.tree_util.tree_map_with_path(visit, updates), state

    return optax.GradientTransformation(init_fn, update_fn)
