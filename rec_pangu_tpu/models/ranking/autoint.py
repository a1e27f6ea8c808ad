"""AutoInt (parity: rec_pangu/models/ranking/autoint.py:14-88): stacked
multi-head self-attention over field embeddings + DNN + LR, summed."""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.attention import MultiHeadSelfAttention
from ...ops.embedding import FusedEmbedding, LRLayer
from ...ops.mlp import KERNEL_INIT, MLP
from ..base import RankModelBase, register_model
from ..losses import get_loss_fn


@register_model("AutoInt")
class AutoInt(RankModelBase):
    enc_dict: Any = None
    embedding_dim: int = 32
    dnn_hidden_units: Sequence[int] = (64, 64, 64)
    attention_layers: int = 1
    num_heads: int = 1
    attention_dim: int = 8
    loss_fun: str = "bce"

    @nn.compact
    def __call__(self, batch, train: bool = True):
        emb = FusedEmbedding(self.spec, self.embedding_dim)(batch["sparse"], batch.get("emb_plan"))
        att_out = emb
        for _ in range(self.attention_layers):
            att_out = MultiHeadSelfAttention(
                attention_dim=self.attention_dim, num_heads=self.num_heads,
                align_to="output")(att_out, train=train)
        logit = nn.Dense(1, kernel_init=KERNEL_INIT)(
            att_out.reshape(att_out.shape[0], -1))
        dnn_input = jnp.concatenate([emb.reshape(emb.shape[0], -1), batch["dense"]], axis=1)
        logit += MLP(self.dnn_hidden_units, output_dim=1)(dnn_input, train)
        logit += LRLayer(self.spec)(batch["sparse"], batch["dense"], batch.get("emb_plan"))
        y_pred = nn.sigmoid(logit)
        out = {"pred": y_pred}
        if train:
            out["loss"] = get_loss_fn(self.loss_fun)(y_pred, batch["label"])
        return out
