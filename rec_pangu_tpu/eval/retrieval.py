"""Full-corpus retrieval eval — the faiss replacement.

Parity targets:
* get_recall_predict <- rec_pangu/utils/evaluate.py:14-87 — L2-normalize item
  and user embeddings, brute-force inner-product top-N (faiss IndexFlatIP);
  multi-interest [B,K,D] flattens to B*K queries whose results are merged per
  user by score desc with dedup, skipping item id 0 (evaluate.py:68-86);
  the single-interest path keeps raw top-N ids unfiltered (evaluate.py:59-66).
* evaluate_recall   <- rec_pangu/utils/evaluate.py:90-143 — including its
  idiosyncratic ndcg: idcg is computed from the *final* per-user hit count.

TPU-native departure: scoring is one jitted ``[B,D] x [D,V]`` matmul (MXU)
plus ``jax.lax.top_k`` on device, instead of a host round-trip into C++ faiss.
The matmul is batched over the eval loader; see parallel/topk.py for the
device-sharded variant.
"""
from __future__ import annotations

import functools
import math
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Row-normalize; zero rows stay zero (sklearn.preprocessing.normalize parity)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def make_topn_scorer(item_embs: jnp.ndarray, topn: int,
                     approx_recall_target: float | None = None):
    """Returns a jitted fn: user_embs [B, D] -> (scores [B, topn], ids [B, topn]).

    ``approx_recall_target`` (e.g. 0.99) switches the candidate selection to
    ``jax.lax.approx_max_k`` — the TPU-optimized partial-reduce top-k that
    avoids the full sort ``lax.top_k`` pays on large corpora.  Exact by
    default for metric parity with the reference's faiss IndexFlatIP."""
    items = l2_normalize(item_embs.astype(jnp.float32))

    @jax.jit
    def score(user_embs: jnp.ndarray):
        u = l2_normalize(user_embs.astype(jnp.float32))
        s = jnp.dot(u, items.T, preferred_element_type=jnp.float32)
        if approx_recall_target is not None:
            return jax.lax.approx_max_k(s, topn,
                                        recall_target=approx_recall_target)
        return jax.lax.top_k(s, topn)

    return score


def merge_multi_interest(ids: np.ndarray, scores: np.ndarray, topn: int) -> List[int]:
    """Merge K interest result lists for one user: sort by score desc, dedup,
    drop padding item 0, keep topn (parity: evaluate.py:77-86).

    Reference-shaped oracle; the batch path uses the jitted
    ``batched_merge_multi_interest`` (identical output, pinned by
    tests/test_metrics.py)."""
    flat = sorted(zip(ids.reshape(-1).tolist(), scores.reshape(-1).tolist()),
                  key=lambda t: t[1], reverse=True)
    seen: List[int] = []
    seen_set = set()
    for iid, _ in flat:
        if iid != 0 and iid not in seen_set:
            seen.append(iid)
            seen_set.add(iid)
            if len(seen) >= topn:
                break
    return seen


def batched_merge_multi_interest_np(ids: np.ndarray, scores: np.ndarray,
                                    topn: int):
    """NumPy twin of :func:`batched_merge_multi_interest` — the production
    eval path.  Batched C argsorts + fancy indexing merge the whole batch in
    a few ms; the device version's per-element scatters are row-serial on
    TPU (measured 5.7 s per 512-user batch over the tunneled chip vs ~6 ms
    here), so the merge runs on host where it is cheapest."""
    b, n = ids.shape
    key = np.where(ids == 0, -np.inf, scores.astype(np.float64))
    order = np.argsort(-key, axis=1, kind="stable")
    ids_s = np.take_along_axis(ids, order, axis=1)
    ord2 = np.argsort(ids_s, axis=1, kind="stable")
    ids_g = np.take_along_axis(ids_s, ord2, axis=1)
    first_g = np.concatenate(
        [np.ones((b, 1), bool), ids_g[:, 1:] != ids_g[:, :-1]], axis=1)
    rows = np.arange(b)[:, None]
    keep = np.zeros((b, n), bool)
    keep[rows, ord2] = first_g
    keep &= ids_s != 0
    pos = np.cumsum(keep, axis=1) - 1
    valid = keep & (pos < topn)
    merged = np.zeros((b, topn), ids.dtype)
    merged[np.nonzero(valid)[0], pos[valid]] = ids_s[valid]
    counts = np.minimum(keep.sum(axis=1), topn)
    return merged, counts


@functools.partial(jax.jit, static_argnames=("topn",))
def batched_merge_multi_interest(ids: jnp.ndarray, scores: jnp.ndarray,
                                 topn: int):
    """Device-side merge of K interest result lists for a whole batch.

    ``ids``/``scores`` are [B, K*N].  Returns (merged [B, topn] ids padded
    with 0, counts [B]).  Semantics match ``merge_multi_interest`` exactly:
    stable sort by score desc (ties keep flat order, like Python's stable
    ``sorted``), drop id 0, dedup keeping the highest-scored occurrence.
    Replaces the per-user host loop that was O(B) Python at eval time."""
    b, n = ids.shape
    # stable desc sort; id-0 entries sink to the bottom
    key = jnp.where(ids == 0, -jnp.inf, scores.astype(jnp.float32))
    order = jnp.argsort(-key, axis=1, stable=True)
    ids_s = jnp.take_along_axis(ids, order, axis=1)
    # first-occurrence-in-score-order mask: stable id-sort groups duplicates
    # while preserving score order inside each group
    ord2 = jnp.argsort(ids_s, axis=1, stable=True)
    ids_g = jnp.take_along_axis(ids_s, ord2, axis=1)
    first_g = jnp.concatenate(
        [jnp.ones((b, 1), bool), ids_g[:, 1:] != ids_g[:, :-1]], axis=1)
    rows = jnp.arange(b)[:, None]
    keep = jnp.zeros((b, n), bool).at[rows, ord2].set(first_g)
    keep = keep & (ids_s != 0)
    pos = jnp.cumsum(keep, axis=1) - 1
    valid = keep & (pos < topn)
    slot = jnp.where(valid, pos, topn)            # invalid -> overflow slot
    merged = jnp.zeros((b, topn + 1), ids.dtype).at[rows, slot].set(
        jnp.where(valid, ids_s, 0), mode="drop")[:, :topn]
    counts = jnp.minimum(jnp.sum(keep, axis=1), topn)
    return merged, counts


def get_recall_predict(model, variables, test_loader, topn: int = 200,
                       user_emb_key: str = "user_emb",
                       mesh=None,
                       approx_recall_target: float | None = None) -> Dict[str, List[int]]:
    """Run the model over the eval loader and return {user: top-N item ids}.

    With ``mesh`` the scoring runs as a two-stage distributed top-k with the
    item table row-sharded over the model axis (parallel/topk.py).
    ``approx_recall_target`` enables the TPU approx top-k fast path on the
    single-device scorer (see make_topn_scorer)."""
    item_embs = model.apply(variables, method="output_items")
    if mesh is not None:
        from ..parallel.topk import distributed_topk, pad_to_multiple
        from ..parallel.mesh import MODEL_AXIS

        n_model = mesh.shape[MODEL_AXIS]
        items_n = l2_normalize(item_embs.astype(jnp.float32))
        num_valid = items_n.shape[0]
        items_p = pad_to_multiple(items_n, n_model, axis=0)

        def scorer(user_embs):
            u = l2_normalize(jnp.asarray(user_embs, jnp.float32))
            with mesh:
                return distributed_topk(mesh, u, items_p, topn,
                                        num_valid=num_valid)
    else:
        scorer = make_topn_scorer(item_embs, topn,
                                  approx_recall_target=approx_recall_target)

    user_fn = jax.jit(lambda batch: model.apply(variables, batch, False))

    preds: Dict[str, List[int]] = {}
    for batch in test_loader:
        users = batch.pop("user")
        out = user_fn(batch)
        user_embs = np.asarray(out[user_emb_key])
        if user_embs.ndim == 2:
            _, ids = scorer(user_embs)
            ids = np.asarray(ids)
            for i, u in enumerate(users):
                preds[str(u)] = ids[i].tolist()
        else:
            B, K, D = user_embs.shape
            scores, ids = scorer(user_embs.reshape(B * K, D))
            merged, counts = batched_merge_multi_interest_np(
                np.asarray(ids).reshape(B, -1),
                np.asarray(scores).reshape(B, -1), topn)
            for i, u in enumerate(users):
                preds[str(u)] = merged[i, :counts[i]].tolist()
    return preds


def evaluate_recall(preds: Dict[str, List[int]], test_gd: Dict[str, List[int]],
                    topn: int = 50) -> Dict[str, float]:
    total_recall = 0.0
    total_ndcg = 0.0
    total_hitrate = 0
    for user, item_list in test_gd.items():
        if user not in preds:
            continue
        topk = list(preds[user][:topn])
        recall = 0
        dcg = 0.0
        for item_id in item_list:
            if item_id in topk:
                recall += 1
                dcg += 1.0 / math.log2(topk.index(item_id) + 2)
        # reference quirk: idcg uses the FINAL hit count (evaluate.py:126-133)
        idcg = sum(1.0 / math.log2(no + 2) for no in range(recall))
        total_recall += recall * 1.0 / len(item_list)
        if recall > 0:
            total_ndcg += dcg / idcg
            total_hitrate += 1
    total = len(test_gd)
    return {
        f"recall@{topn}": round(total_recall / total, 4),
        f"ndcg@{topn}": round(total_ndcg / total, 4),
        f"hitrate@{topn}": round(total_hitrate * 1.0 / total, 4),
    }
