from .activations import Dice, get_activation
from .mlp import MLP
from .embedding import FusedEmbedding, ItemEmbedding, LRLayer
from .interactions import (
    BilinearInteraction,
    CompressedInteractionNet,
    CrossNet,
    FMLayer,
    HolographicInteraction,
    InteractionMachine,
    MaskBlock,
    SENETLayer,
    inner_product,
)

__all__ = [
    "Dice",
    "get_activation",
    "MLP",
    "FusedEmbedding",
    "ItemEmbedding",
    "LRLayer",
    "BilinearInteraction",
    "CompressedInteractionNet",
    "CrossNet",
    "FMLayer",
    "HolographicInteraction",
    "InteractionMachine",
    "MaskBlock",
    "SENETLayer",
    "inner_product",
]
