"""LR (parity: rec_pangu/models/ranking/lr.py:12-51): wide linear part only."""
from __future__ import annotations

from typing import Any

import flax.linen as nn

from ...ops.embedding import LRLayer
from ..base import RankModelBase, register_model
from ..losses import get_loss_fn


@register_model("LR")
class LR(RankModelBase):
    enc_dict: Any = None
    loss_fun: str = "bce"

    @nn.compact
    def __call__(self, batch, train: bool = True):
        logit = LRLayer(self.spec)(batch["sparse"], batch["dense"], batch.get("emb_plan"))
        y_pred = nn.sigmoid(logit)
        out = {"pred": y_pred}
        if train:
            out["loss"] = get_loss_fn(self.loss_fun)(y_pred, batch["label"])
        return out
