"""DeepFM (parity: rec_pangu/models/ranking/deepfm.py:13-66).

Structure: fused embedding -> FM pairwise logit + DNN over
[flattened embeddings ++ dense] -> sigmoid(sum).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.embedding import FusedEmbedding
from ...ops.interactions import inner_product
from ...ops.mlp import MLP
from ..base import RankModelBase, register_model
from ..losses import get_loss_fn


@register_model("DeepFM")
class DeepFM(RankModelBase):
    enc_dict: Any = None
    embedding_dim: int = 32
    hidden_units: Sequence[int] = (64, 64, 64)
    loss_fun: str = "bce"

    @nn.compact
    def __call__(self, batch, train: bool = True):
        emb = FusedEmbedding(self.spec, self.embedding_dim)(batch["sparse"], batch.get("emb_plan"))  # [B,F,D]
        fm_logit = inner_product(emb, "product_sum_pooling")  # [B,1]
        dnn_input = jnp.concatenate(
            [emb.reshape(emb.shape[0], -1), batch["dense"]], axis=1
        )
        dnn_logit = MLP(self.hidden_units, output_dim=1, hidden_activations="relu",
                        dropout_rates=0.0)(dnn_input, train)
        y_pred = nn.sigmoid(fm_logit + dnn_logit)
        out = {"pred": y_pred}
        if train:
            out["loss"] = get_loss_fn(self.loss_fun)(y_pred, batch["label"])
        return out
