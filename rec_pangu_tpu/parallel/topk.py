"""Distributed brute-force MIPS (the faiss replacement at scale).

The item table is sharded over the ``model`` mesh axis; each device scores the
(replicated or data-sharded) queries against ITS item shard and takes a local
top-k, then the per-shard candidates are all-gathered and reduced to a global
top-k — the classic two-stage distributed top-k (SURVEY.md §2.5).  Expressed
with shard_map so the collective is explicit ICI traffic of k candidates per
shard instead of a full [B, V] gather.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS


def distributed_topk(mesh: Mesh, user_embs: jnp.ndarray, item_embs: jnp.ndarray,
                     k: int):
    """user_embs [B, D] x item_embs [V, D] (V divisible by model-axis size)
    -> (scores [B, k], global item ids [B, k])."""
    n_model = mesh.shape[MODEL_AXIS]
    V = item_embs.shape[0]
    shard_rows = V // n_model

    def local_score(u, items):
        # items: this device's [V/P, D] shard; ids offset by shard position
        idx = jax.lax.axis_index(MODEL_AXIS)
        scores = jnp.dot(u, items.T, preferred_element_type=jnp.float32)
        s, i = jax.lax.top_k(scores, min(k, shard_rows))
        i = i + idx * shard_rows
        # gather candidates from every model shard: [P*k_local] per row
        s_all = jax.lax.all_gather(s, MODEL_AXIS, axis=1, tiled=True)
        i_all = jax.lax.all_gather(i, MODEL_AXIS, axis=1, tiled=True)
        s_fin, pos = jax.lax.top_k(s_all, k)
        return s_fin, jnp.take_along_axis(i_all, pos, axis=1)

    fn = jax.jit(
        jax.shard_map(
            local_score, mesh=mesh,
            in_specs=(P(), P(MODEL_AXIS, None)),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
    return fn(user_embs, item_embs)


def pad_to_multiple(x: jnp.ndarray, multiple: int, axis: int = 0,
                    value: float = 0.0) -> jnp.ndarray:
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, rem)
    return jnp.pad(x, pads, constant_values=value)
