from .mesh import DATA_AXIS, MODEL_AXIS, make_mesh
from .sharding import batch_shardings, shard_batch, shard_state, state_shardings

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "batch_shardings",
    "shard_batch",
    "shard_state",
    "state_shardings",
]
