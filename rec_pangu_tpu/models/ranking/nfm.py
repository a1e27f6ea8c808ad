"""NFM (parity: rec_pangu/models/ranking/nfm.py:13-76): LR + Bi-interaction
pooling -> MLP."""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn

from ...ops.embedding import FusedEmbedding, LRLayer
from ...ops.interactions import inner_product
from ...ops.mlp import MLP
from ..base import RankModelBase, register_model
from ..losses import get_loss_fn


@register_model("NFM")
class NFM(RankModelBase):
    enc_dict: Any = None
    embedding_dim: int = 32
    hidden_units: Sequence[int] = (64, 64, 64)
    loss_fun: str = "bce"

    @nn.compact
    def __call__(self, batch, train: bool = True):
        lr_logit = LRLayer(self.spec)(batch["sparse"], batch["dense"], batch.get("emb_plan"))
        emb = FusedEmbedding(self.spec, self.embedding_dim)(batch["sparse"], batch.get("emb_plan"))
        bi_pooling = inner_product(emb, "Bi_interaction_pooling")  # [B, D]
        dnn_logit = MLP(self.hidden_units, output_dim=1, hidden_activations="relu",
                        dropout_rates=0.0)(bi_pooling, train)
        y_pred = nn.sigmoid(lr_logit + dnn_logit)
        out = {"pred": y_pred}
        if train:
            out["loss"] = get_loss_fn(self.loss_fun)(y_pred, batch["label"])
        return out
