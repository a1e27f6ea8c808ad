"""FM (parity: rec_pangu/models/ranking/fm.py:12-56): pairwise-interaction
logit only (no wide part in the reference)."""
from __future__ import annotations

from typing import Any

import flax.linen as nn

from ...ops.embedding import FusedEmbedding
from ...ops.interactions import inner_product
from ..base import RankModelBase, register_model
from ..losses import get_loss_fn


@register_model("FM")
class FM(RankModelBase):
    enc_dict: Any = None
    embedding_dim: int = 32
    loss_fun: str = "bce"

    @nn.compact
    def __call__(self, batch, train: bool = True):
        emb = FusedEmbedding(self.spec, self.embedding_dim)(batch["sparse"], batch.get("emb_plan"))
        y_pred = nn.sigmoid(inner_product(emb, "product_sum_pooling"))
        out = {"pred": y_pred}
        if train:
            out["loss"] = get_loss_fn(self.loss_fun)(y_pred, batch["label"])
        return out
