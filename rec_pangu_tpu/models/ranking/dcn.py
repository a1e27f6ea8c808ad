"""DCN (parity: rec_pangu/models/ranking/dcn.py:14-68): CrossNet over
[flattened embeddings ++ dense] -> Dense(1)."""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.embedding import FusedEmbedding
from ...ops.interactions import CrossNet
from ...ops.mlp import KERNEL_INIT
from ..base import RankModelBase, register_model
from ..losses import get_loss_fn


@register_model("DCN")
class DCN(RankModelBase):
    enc_dict: Any = None
    embedding_dim: int = 32
    hidden_units: Sequence[int] = (64, 64, 64)  # unused by reference forward; kept for API parity
    crossing_layers: int = 3
    loss_fun: str = "bce"

    @nn.compact
    def __call__(self, batch, train: bool = True):
        emb = FusedEmbedding(self.spec, self.embedding_dim)(batch["sparse"], batch.get("emb_plan"))
        x0 = jnp.concatenate([emb.reshape(emb.shape[0], -1), batch["dense"]], axis=1)
        cross_out = CrossNet(self.crossing_layers)(x0)
        y_pred = nn.sigmoid(nn.Dense(1, kernel_init=KERNEL_INIT)(cross_out))
        out = {"pred": y_pred}
        if train:
            out["loss"] = get_loss_fn(self.loss_fun)(y_pred, batch["label"])
        return out
