"""xDeepFM (parity: rec_pangu/models/ranking/xdeepfm.py:13-79): LR + CIN + DNN
summed logits."""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.embedding import FusedEmbedding, LRLayer
from ...ops.interactions import CompressedInteractionNet
from ...ops.mlp import MLP
from ..base import RankModelBase, register_model
from ..losses import get_loss_fn


@register_model("xDeepFM")
class xDeepFM(RankModelBase):
    enc_dict: Any = None
    embedding_dim: int = 32
    dnn_hidden_units: Sequence[int] = (64, 64, 64)
    cin_layer_units: Sequence[int] = (16, 16, 16)
    loss_fun: str = "bce"

    @nn.compact
    def __call__(self, batch, train: bool = True):
        emb = FusedEmbedding(self.spec, self.embedding_dim)(batch["sparse"], batch.get("emb_plan"))
        lr_logit = LRLayer(self.spec)(batch["sparse"], batch["dense"], batch.get("emb_plan"))
        cin_logit = CompressedInteractionNet(self.num_sparse, self.cin_layer_units,
                                             output_dim=1)(emb)
        dnn_input = jnp.concatenate([emb.reshape(emb.shape[0], -1), batch["dense"]], axis=1)
        # reference uses MLP defaults here (ReLU, dropout 0.1 — xdeepfm.py:35-37)
        dnn_logit = MLP(self.dnn_hidden_units, output_dim=1)(dnn_input, train)
        y_pred = nn.sigmoid(lr_logit + cin_logit + dnn_logit)
        out = {"pred": y_pred}
        if train:
            out["loss"] = get_loss_fn(self.loss_fun)(y_pred, batch["label"])
        return out
