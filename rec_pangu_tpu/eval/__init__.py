from .metrics import log_loss, roc_auc_score, compute_ranking_metrics
from .retrieval import evaluate_recall, get_recall_predict

__all__ = [
    "log_loss",
    "roc_auc_score",
    "compute_ranking_metrics",
    "evaluate_recall",
    "get_recall_predict",
]
