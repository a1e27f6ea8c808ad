from .base import MODEL_REGISTRY, get_model, register_model, RankModelBase, SequenceModelBase
from .losses import get_loss_fn
from .ranking import *  # noqa: F401,F403
from .multi_task import *  # noqa: F401,F403
from .sequence import *  # noqa: F401,F403
from .graph import *  # noqa: F401,F403

__all__ = [
    "MODEL_REGISTRY",
    "get_model",
    "register_model",
    "RankModelBase",
    "SequenceModelBase",
    "get_loss_fn",
]
