"""AITM (parity: rec_pangu/models/multi_task/aitm.py:14-101): click tower +
conversion tower + attention info transfer; loss adds the calibration
constraint ``sum(max(pCVR - pCTR, 0))`` with weight 0.6."""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.attention import MultiHeadSelfAttention
from ...ops.embedding import FusedEmbedding
from ...ops.mlp import MLP
from .common import XAVIER
from ..base import RankModelBase, register_model
from ..losses import bce_loss


@register_model("AITM")
class AITM(RankModelBase):
    enc_dict: Any = None
    embedding_dim: int = 32
    tower_dims: Sequence[int] = (400, 400, 400)
    drop_prob: Sequence[float] = (0.1, 0.1, 0.1)
    constraint_weight: float = 0.6

    @nn.compact
    def __call__(self, batch, train: bool = True):
        emb = FusedEmbedding(self.spec, self.embedding_dim,
                             init_mode="xavier")(batch["sparse"], batch.get("emb_plan"))
        feat = emb.reshape(emb.shape[0], -1)

        tower_click = MLP(self.tower_dims, hidden_activations="relu",
                          dropout_rates=list(self.drop_prob),
                          kernel_init=XAVIER,
                          bias_init=nn.initializers.zeros,
                          name="click_tower")(feat, train)
        tower_conv = MLP(self.tower_dims, hidden_activations="relu",
                         dropout_rates=list(self.drop_prob),
                         kernel_init=XAVIER,
                         bias_init=nn.initializers.zeros,
                         name="conversion_tower")(feat, train)

        info = nn.Dense(self.tower_dims[-1], kernel_init=XAVIER,
                         bias_init=nn.initializers.zeros)(tower_click)
        info = nn.relu(info)
        info = nn.Dropout(self.drop_prob[-1], deterministic=not train)(info)

        ait_in = jnp.stack([tower_conv, info], axis=1)  # [B, 2, dim]
        ait = MultiHeadSelfAttention(kernel_init=XAVIER,
                                     name="attention_layer")(ait_in, train=train)
        ait = jnp.sum(ait, axis=1)

        click = nn.sigmoid(nn.Dense(1, kernel_init=XAVIER, bias_init=nn.initializers.zeros,
                                    name="click_layer")(tower_click))[:, 0]
        conversion = nn.sigmoid(nn.Dense(1, kernel_init=XAVIER, bias_init=nn.initializers.zeros,
                                         name="conversion_layer")(ait))[:, 0]
        out = {"task1_pred": click, "task2_pred": conversion}
        if train:
            constraint = jnp.sum(jnp.maximum(conversion - click, 0.0))
            out["loss"] = bce_loss(click, batch["label"][:, 0]) + \
                bce_loss(conversion, batch["label"][:, 1]) + \
                self.constraint_weight * constraint
        return out
