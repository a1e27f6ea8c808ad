"""ESSM (parity: rec_pangu/models/multi_task/essm.py:12-75): CTR and CVR
towers over sparse embeddings only (the reference ignores dense features,
essm.py:26); loss = BCE(pCTCVR, task2) + 0.5 * BCE(pCTR, task1)."""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn

from ...ops.embedding import FusedEmbedding
from ...ops.mlp import MLP
from ..base import RankModelBase, register_model
from ..losses import bce_loss
from .common import XAVIER


@register_model("ESSM")
class ESSM(RankModelBase):
    enc_dict: Any = None
    embedding_dim: int = 40
    hidden_dim: Sequence[int] = (128, 64)
    dropouts: Sequence[float] = (0.2, 0.2)

    @nn.compact
    def __call__(self, batch, train: bool = True):
        emb = FusedEmbedding(self.spec, self.embedding_dim,
                             init_mode="xavier")(batch["sparse"], batch.get("emb_plan"))
        hidden = emb.reshape(emb.shape[0], -1)
        click = nn.sigmoid(
            MLP(self.hidden_dim, output_dim=1, hidden_activations="relu",
                dropout_rates=list(self.dropouts), kernel_init=XAVIER,
                bias_init=nn.initializers.zeros,
                name="ctr_layer")(hidden, train))[:, 0]
        conversion = nn.sigmoid(
            MLP(self.hidden_dim, output_dim=1, hidden_activations="relu",
                dropout_rates=list(self.dropouts), kernel_init=XAVIER,
                bias_init=nn.initializers.zeros,
                name="cvr_layer")(hidden, train))[:, 0]
        out = {"task1_pred": click, "task2_pred": conversion}
        if train:
            pctcvr = click * conversion
            out["loss"] = bce_loss(pctcvr, batch["label"][:, 1]) + \
                0.5 * bce_loss(click, batch["label"][:, 0])
        return out
