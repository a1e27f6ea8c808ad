"""rec_pangu_tpu — a TPU-native recommender framework.

Same capabilities as HaSai666/rec_pangu (CTR ranking, multi-task ranking,
sequence recall), rebuilt TPU-first on jax/XLA/pallas: fused embedding tables,
jitted fused train steps, on-device top-k retrieval, and jax.sharding meshes
for scale-out.
"""
__version__ = "0.1.0"

from .data import get_dataloader
from .models import get_model
from .train import GraphTrainer, RankTrainer, SequenceTrainer
from .utils.check_version import check_version

check_version(__version__)

__all__ = ["get_dataloader", "get_model", "GraphTrainer", "RankTrainer",
           "SequenceTrainer", "__version__"]
