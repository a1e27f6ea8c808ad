from .mesh import (DATA_AXIS, MODEL_AXIS, active_mesh,
                   initialize_multihost, make_mesh,
                   set_active_mesh)
from .sharding import batch_shardings, shard_batch, shard_state, state_shardings

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "initialize_multihost",
    "active_mesh",
    "set_active_mesh",
    "batch_shardings",
    "shard_batch",
    "shard_state",
    "state_shardings",
]
