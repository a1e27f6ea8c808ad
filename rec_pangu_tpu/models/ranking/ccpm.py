"""CCPM (parity: rec_pangu/models/ranking/ccpm.py:14-107): zero-pad + conv +
k-max-pooling stack over the field axis -> Dense(1)."""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn

from ...ops.conv import CCPMConvLayer
from ...ops.embedding import FusedEmbedding
from ...ops.mlp import KERNEL_INIT
from ..base import RankModelBase, register_model
from ..losses import get_loss_fn


@register_model("CCPM")
class CCPM(RankModelBase):
    enc_dict: Any = None
    embedding_dim: int = 32
    hidden_units: Sequence[int] = (64, 64, 64)  # kept for API parity (unused in forward)
    channels: Sequence[int] = (4, 4, 2)
    kernel_heights: Sequence[int] = (6, 5, 3)
    loss_fun: str = "bce"

    @nn.compact
    def __call__(self, batch, train: bool = True):
        emb = FusedEmbedding(self.spec, self.embedding_dim)(batch["sparse"], batch.get("emb_plan"))
        conv_out = CCPMConvLayer(self.num_sparse, self.channels,
                                 self.kernel_heights)(emb)  # [B, 3, D, C_last]
        logit = nn.Dense(1, kernel_init=KERNEL_INIT)(
            conv_out.reshape(conv_out.shape[0], -1))
        y_pred = nn.sigmoid(logit)
        out = {"pred": y_pred}
        if train:
            out["loss"] = get_loss_fn(self.loss_fun)(y_pred, batch["label"])
        return out
