"""Device mesh construction (SURVEY.md §2.6).

Axes: ``data`` (DP — batch sharded) × ``model`` (TP — embedding tables
row-sharded).  On a pod slice the same code maps DP over ICI/DCN and TP over
ICI; in tests it runs on a forced 8-device CPU host.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"

# The mesh the trainer is currently driving.  Modules that need a concrete
# mesh at trace time (the shard_map-wrapped planned-embedding path,
# ops/kernels/embedding_grad.planned_gather_dp) read it here — flax module
# attributes are frozen at construction, long before a mesh exists.  Set by
# _BaseTrainer._build_state; last writer wins, so interleaving two trainers
# on different meshes re-traces against the newest mesh (a loud shape error,
# never silent corruption, because the shipped plan's shard count must match).
_ACTIVE_MESH: Optional[Mesh] = None


def set_active_mesh(mesh: Optional[Mesh]) -> Optional[Mesh]:
    """Install ``mesh`` as the trace-time mesh; returns the previous one."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    return prev


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (SURVEY.md §2.6): call ONCE per host process
    before ``make_mesh()`` — afterwards ``jax.devices()`` spans the whole
    slice/pod and the same mesh/sharding code runs unchanged (DP over
    ICI+DCN, TP over ICI).  On TPU pods every argument is auto-discovered
    from the metadata server, so a bare ``initialize_multihost()`` suffices;
    pass them explicitly for CPU/GPU clusters.  Pair with the loader's
    ``shard_rank=jax.process_index(), num_shards=jax.process_count()`` for
    per-host input sharding."""
    import jax

    jax.distributed.initialize(coordinator_address, num_processes, process_id)


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = list(jax.devices())
        if n_data is not None and len(devices) < n_data * n_model:
            # fall back to the forced host-device CPU mesh (tests / dryrun)
            devices = list(jax.devices("cpu"))
    else:
        devices = list(devices)
    if n_data is None:
        n_data = len(devices) // n_model
    n = n_data * n_model
    assert n <= len(devices), f"need {n} devices, have {len(devices)}"
    grid = np.array(devices[:n]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))
