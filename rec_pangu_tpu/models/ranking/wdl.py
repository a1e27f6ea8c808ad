"""Wide&Deep (parity: rec_pangu/models/ranking/wdl.py:13-73)."""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.embedding import FusedEmbedding, LRLayer
from ...ops.mlp import MLP
from ..base import RankModelBase, register_model
from ..losses import get_loss_fn


@register_model("WDL")
class WDL(RankModelBase):
    enc_dict: Any = None
    embedding_dim: int = 32
    hidden_units: Sequence[int] = (64, 64, 64)
    loss_fun: str = "bce"

    @nn.compact
    def __call__(self, batch, train: bool = True):
        wide_logit = LRLayer(self.spec)(batch["sparse"], batch["dense"], batch.get("emb_plan"))
        emb = FusedEmbedding(self.spec, self.embedding_dim)(batch["sparse"], batch.get("emb_plan"))
        dnn_input = jnp.concatenate([emb.reshape(emb.shape[0], -1), batch["dense"]], axis=1)
        deep_logit = MLP(self.hidden_units, output_dim=1, hidden_activations="relu",
                         dropout_rates=0.0)(dnn_input, train)
        y_pred = nn.sigmoid(wide_logit + deep_logit)
        out = {"pred": y_pred}
        if train:
            out["loss"] = get_loss_fn(self.loss_fun)(y_pred, batch["label"])
        return out
