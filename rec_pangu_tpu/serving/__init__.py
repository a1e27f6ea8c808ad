from .export import export2tf, export_stablehlo
from .scorer import construct_dummy_data, make_ranking_scorer, make_retrieval_scorer

__all__ = [
    "export2tf",
    "export_stablehlo",
    "construct_dummy_data",
    "make_ranking_scorer",
    "make_retrieval_scorer",
]
