"""FiBiNet (parity: rec_pangu/models/ranking/fibinet.py:13-77): LR + bilinear
interactions of the raw and SENET-reweighted embeddings -> MLP."""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.embedding import FusedEmbedding, LRLayer
from ...ops.interactions import BilinearInteraction, SENETLayer
from ...ops.mlp import MLP
from ..base import RankModelBase, register_model
from ..losses import get_loss_fn


@register_model("FiBiNet")
class FiBiNet(RankModelBase):
    enc_dict: Any = None
    embedding_dim: int = 32
    hidden_units: Sequence[int] = (64, 64, 64)
    loss_fun: str = "bce"

    @nn.compact
    def __call__(self, batch, train: bool = True):
        lr_logit = LRLayer(self.spec)(batch["sparse"], batch["dense"], batch.get("emb_plan"))
        emb = FusedEmbedding(self.spec, self.embedding_dim)(batch["sparse"], batch.get("emb_plan"))
        senet_emb = SENETLayer(3)(emb)
        bilinear = BilinearInteraction("field_interaction")
        p = bilinear(emb)
        q = bilinear(senet_emb)
        comb = jnp.concatenate([p, q], axis=1).reshape(emb.shape[0], -1)
        dnn_input = jnp.concatenate([comb, batch["dense"]], axis=1)
        dnn_logit = MLP(self.hidden_units, output_dim=1, hidden_activations="relu",
                        dropout_rates=0.0)(dnn_input, train)
        y_pred = nn.sigmoid(lr_logit + dnn_logit)
        out = {"pred": y_pred}
        if train:
            out["loss"] = get_loss_fn(self.loss_fun)(y_pred, batch["label"])
        return out
