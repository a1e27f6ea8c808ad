"""Jitted serving scorers.

Replaces the reference's ONNX round-trip (rec_pangu/serving/ranking_server.py)
with direct jitted inference functions:

* make_ranking_scorer: fused batch {'sparse','dense'} -> pred probabilities.
* make_retrieval_scorer: history batch -> top-k item ids + scores (the
  serving-side equivalent of the faiss index, fused scoring+top_k on device).
* construct_dummy_data: schema-shaped zero batch (parity:
  ranking_server.py:12-32 construct_demmy_data) for tracing/export.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.encoder import FeatureSpec
from ..eval.retrieval import l2_normalize


def construct_dummy_data(enc_dict: dict, batch_size: int = 2) -> Dict[str, np.ndarray]:
    spec = FeatureSpec.from_enc_dict(enc_dict)
    return {
        "sparse": np.zeros((batch_size, spec.num_sparse), np.int32),
        "dense": np.zeros((batch_size, spec.num_dense), np.float32),
    }


def make_ranking_scorer(model, variables, attach_plan: bool = True) -> Callable:
    """Jitted batch scorer.  ``attach_plan`` adds the host-side embedding
    sort plan per batch when the model/table qualify — the forward then uses
    the streaming fetch kernel instead of XLA's row-serial gather (measured
    3.4 ms vs 5.4 ms at batch 8192, 16x100k-vocab, dim 32)."""
    spec = getattr(model, "spec", None)
    dim = getattr(model, "embedding_dim", None)

    @jax.jit
    def _score(batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        out = model.apply(variables, batch, False)
        return out["pred"].reshape(-1)

    if not attach_plan or spec is None or dim is None:
        return _score

    def score(batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        from ..ops.embedding import attach_emb_plan

        if "emb_plan" not in batch:
            batch = attach_emb_plan(dict(batch), spec, int(dim))
        return _score(batch)

    return score


def make_retrieval_scorer(model, variables, topk: int = 200,
                          normalize: bool = True) -> Callable:
    item_embs = model.apply(variables, method="output_items")
    items = l2_normalize(item_embs) if normalize else item_embs

    @jax.jit
    def retrieve(batch: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        user_emb = model.apply(variables, batch, False)["user_emb"]
        if user_emb.ndim == 3:  # multi-interest: best score over interests
            u = l2_normalize(user_emb) if normalize else user_emb
            scores = jnp.einsum("bkd,nd->bkn", u, items).max(axis=1)
        else:
            u = l2_normalize(user_emb) if normalize else user_emb
            scores = u @ items.T
        return jax.lax.top_k(scores, topk)

    return retrieve
