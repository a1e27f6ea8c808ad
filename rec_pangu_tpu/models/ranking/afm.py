"""AFM — Attentional Factorization Machine.

The reference's afm.py is a verbatim FiBiNet clone flagged ``# Fixme``
(rec_pangu/models/ranking/afm.py:12); per SURVEY.md §7.1 we implement the
real AFM (Xiao et al. 2017): LR + attention-pooled pairwise element-wise
interactions:

    a_ij = softmax_j(h^T relu(W (e_i ⊙ e_j) + b));  logit += p^T Σ a_ij (e_i ⊙ e_j)
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...ops.embedding import FusedEmbedding, LRLayer
from ...ops.interactions import inner_product
from ...ops.mlp import KERNEL_INIT
from ..base import RankModelBase, register_model
from ..losses import get_loss_fn


@register_model("AFM")
class AFM(RankModelBase):
    enc_dict: Any = None
    embedding_dim: int = 32
    attention_dim: int = 32
    dropout_rate: float = 0.0
    loss_fun: str = "bce"

    @nn.compact
    def __call__(self, batch, train: bool = True):
        lr_logit = LRLayer(self.spec)(batch["sparse"], batch["dense"], batch.get("emb_plan"))
        emb = FusedEmbedding(self.spec, self.embedding_dim)(batch["sparse"], batch.get("emb_plan"))
        pairs = inner_product(emb, "elementwise_product")  # [B, P, D]
        att_h = nn.Dense(self.attention_dim, kernel_init=KERNEL_INIT)(pairs)
        att_score = nn.Dense(1, use_bias=False, kernel_init=KERNEL_INIT)(nn.relu(att_h))
        att = nn.softmax(att_score, axis=1)  # [B, P, 1]
        if self.dropout_rate > 0:
            att = nn.Dropout(self.dropout_rate, deterministic=not train)(att)
        pooled = jnp.sum(att * pairs, axis=1)  # [B, D]
        afm_logit = nn.Dense(1, use_bias=False, kernel_init=KERNEL_INIT)(pooled)
        y_pred = nn.sigmoid(lr_logit + afm_logit)
        out = {"pred": y_pred}
        if train:
            out["loss"] = get_loss_fn(self.loss_fun)(y_pred, batch["label"])
        return out
