"""Sharding policies: which leaf goes where on the mesh.

Policy (BASELINE.json north star):
* embedding tables (any 2-D leaf under a key named ``table`` — the fused
  ranking table and sequence item/cate tables) -> row-sharded over ``model``;
* every other parameter / optimizer moment -> replicated;
* batches -> sharded over ``data`` on the leading axis.

Optimizer moments mirror the params tree (optax adam mu/nu), so the same
key-path match shards them consistently.  XLA inserts the collectives
(gather/psum) implied by these placements — no hand-written comms here.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def _is_table_path(path) -> bool:
    for entry in path:
        name = getattr(entry, "key", None) or getattr(entry, "name", None)
        if name == "table":
            return True
    return False


def state_shardings(state: Any, mesh: Mesh) -> Any:
    """Sharding pytree matching a TrainState (params/batch_stats/opt_state)."""
    replicated = NamedSharding(mesh, P())
    row_sharded = NamedSharding(mesh, P(MODEL_AXIS, None))

    def leaf_sharding(path, x):
        if _is_table_path(path) and getattr(x, "ndim", 0) == 2 and \
                x.shape[0] % mesh.shape[MODEL_AXIS] == 0:
            return row_sharded
        return replicated

    return jax.tree_util.tree_map_with_path(leaf_sharding, state)


def batch_shardings(batch: Any, mesh: Mesh) -> Any:
    data_sharded = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree_util.tree_map(lambda _: data_sharded, batch)


def shard_state(state: Any, mesh: Mesh) -> Any:
    return jax.device_put(state, state_shardings(state, mesh))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    return jax.device_put(batch, batch_shardings(batch, mesh))
