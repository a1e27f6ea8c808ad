"""ShareBottom (parity: rec_pangu/models/multi_task/sharebottom.py:12-92):
shared fused input -> per-task Linear/BN/Dropout towers."""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.embedding import FusedEmbedding
from ..base import RankModelBase, register_model
from .common import TaskTower, multi_task_bce


@register_model("ShareBottom")
class ShareBottom(RankModelBase):
    enc_dict: Any = None
    num_task: int = 2
    embedding_dim: int = 40
    hidden_units: Sequence[int] = (128, 64)
    dropouts: Sequence[float] = (0.2, 0.2)

    @nn.compact
    def __call__(self, batch, train: bool = True):
        emb = FusedEmbedding(self.spec, self.embedding_dim,
                             init_mode="xavier")(batch["sparse"], batch.get("emb_plan"))
        hidden = jnp.concatenate([emb.reshape(emb.shape[0], -1), batch["dense"]], axis=1)
        out = {}
        preds = []
        for i in range(self.num_task):
            p = TaskTower(self.hidden_units, self.dropouts,
                          name=f"task_{i + 1}_dnn")(hidden, train)
            preds.append(p)
            out[f"task{i + 1}_pred"] = p
        if train:
            out["loss"] = multi_task_bce(preds, batch["label"])
        return out
