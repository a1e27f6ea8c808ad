"""Distributed brute-force MIPS (the faiss replacement at scale).

The item table is sharded over the ``model`` mesh axis; each device scores the
(replicated or data-sharded) queries against ITS item shard and takes a local
top-k, then the per-shard candidates are all-gathered and reduced to a global
top-k — the classic two-stage distributed top-k (SURVEY.md §2.5).  Expressed
with shard_map so the collective is explicit ICI traffic of k candidates per
shard instead of a full [B, V] gather.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import MODEL_AXIS


@lru_cache(maxsize=32)
def _build_topk_fn(mesh: Mesh, k: int, shard_rows: int, num_valid: int):
    def local_score(u, items):
        # items: this device's [V/P, D] shard; ids offset by shard position
        idx = jax.lax.axis_index(MODEL_AXIS)
        scores = jnp.dot(u, items.T, preferred_element_type=jnp.float32)
        # mask padding rows (global id >= num_valid) so they never rank
        row_ids = idx * shard_rows + jnp.arange(shard_rows)
        scores = jnp.where(row_ids[None, :] >= num_valid, -jnp.inf, scores)
        s, i = jax.lax.top_k(scores, min(k, shard_rows))
        i = i + idx * shard_rows
        # gather candidates from every model shard: [P*k_local] per row
        s_all = jax.lax.all_gather(s, MODEL_AXIS, axis=1, tiled=True)
        i_all = jax.lax.all_gather(i, MODEL_AXIS, axis=1, tiled=True)
        s_fin, pos = jax.lax.top_k(s_all, k)
        return s_fin, jnp.take_along_axis(i_all, pos, axis=1)

    return jax.jit(
        jax.shard_map(
            local_score, mesh=mesh,
            in_specs=(P(), P(MODEL_AXIS, None)),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )


def distributed_topk(mesh: Mesh, user_embs: jnp.ndarray, item_embs: jnp.ndarray,
                     k: int, num_valid: int | None = None):
    """user_embs [B, D] x item_embs [V, D] (V divisible by model-axis size)
    -> (scores [B, k], global item ids [B, k]).  ``num_valid`` masks padding
    rows appended to make V divisible; the jitted two-stage kernel is cached
    per (mesh, k, shard, num_valid)."""
    n_model = mesh.shape[MODEL_AXIS]
    V = item_embs.shape[0]
    shard_rows = V // n_model
    fn = _build_topk_fn(mesh, k, shard_rows, num_valid if num_valid is not None else V)
    return fn(user_embs, item_embs)


@lru_cache(maxsize=32)
def _build_masked_topk_fn(mesh: Mesh, k: int, shard_rows: int, num_valid: int):
    def local_score(u, items, seen):
        # items: this device's [V/P, D] shard; seen: [B, S] GLOBAL item ids
        # (pads point past the corpus).  Each shard filters the slice of the
        # seen set that falls inside its row range via the same sentinel-
        # column scatter as the single-device _masked_topk, so the two-stage
        # merge ranks exactly the unseen items.
        idx = jax.lax.axis_index(MODEL_AXIS)
        scores = jnp.dot(u, items.T, preferred_element_type=jnp.float32)
        row_ids = idx * shard_rows + jnp.arange(shard_rows)
        scores = jnp.where(row_ids[None, :] >= num_valid, -jnp.inf, scores)
        local_seen = seen - idx * shard_rows
        local_seen = jnp.where((local_seen >= 0) & (local_seen < shard_rows),
                               local_seen, shard_rows)  # sentinel column
        scores = jnp.pad(scores, ((0, 0), (0, 1)))
        rows = jnp.arange(u.shape[0])[:, None]
        scores = scores.at[rows, local_seen].set(-jnp.inf)[:, :-1]
        s, i = jax.lax.top_k(scores, min(k, shard_rows))
        i = i + idx * shard_rows
        s_all = jax.lax.all_gather(s, MODEL_AXIS, axis=1, tiled=True)
        i_all = jax.lax.all_gather(i, MODEL_AXIS, axis=1, tiled=True)
        s_fin, pos = jax.lax.top_k(s_all, k)
        return s_fin, jnp.take_along_axis(i_all, pos, axis=1)

    return jax.jit(
        jax.shard_map(
            local_score, mesh=mesh,
            in_specs=(P(), P(MODEL_AXIS, None), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )


def distributed_masked_topk(mesh: Mesh, user_embs: jnp.ndarray,
                            item_embs: jnp.ndarray, seen: jnp.ndarray,
                            k: int, num_valid: int | None = None):
    """``distributed_topk`` with each user's ``seen`` item ids biased out
    before ranking (GraphTrainer eval under a sharded item table).  ``seen``
    is [B, S] global ids padded with any value >= num_valid."""
    n_model = mesh.shape[MODEL_AXIS]
    V = item_embs.shape[0]
    shard_rows = V // n_model
    fn = _build_masked_topk_fn(mesh, k, shard_rows,
                               num_valid if num_valid is not None else V)
    return fn(user_embs, item_embs, seen)


def pad_to_multiple(x: jnp.ndarray, multiple: int, axis: int = 0,
                    value: float = 0.0) -> jnp.ndarray:
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, rem)
    return jnp.pad(x, pads, constant_values=value)
