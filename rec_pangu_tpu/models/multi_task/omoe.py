"""OMOE (parity: rec_pangu/models/multi_task/omoe.py:13-107): shared experts
with ONE input-independent softmax gate, then per-task towers."""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.activations import get_activation
from ...ops.embedding import FusedEmbedding
from ..base import RankModelBase, register_model
from .common import TaskTower, multi_task_bce
from .mmoe import NORMAL_INIT, UNIFORM_INIT


@register_model("OMOE")
class OMOE(RankModelBase):
    enc_dict: Any = None
    num_task: int = 2
    n_expert: int = 3
    embedding_dim: int = 40
    omoe_hidden_dim: int = 128
    expert_activation: Optional[str] = None
    hidden_dim: Sequence[int] = (128, 64)
    dropouts: Sequence[float] = (0.2, 0.2)

    @nn.compact
    def __call__(self, batch, train: bool = True):
        emb = FusedEmbedding(self.spec, self.embedding_dim,
                             init_mode="xavier")(batch["sparse"], batch.get("emb_plan"))
        hidden = jnp.concatenate([emb.reshape(emb.shape[0], -1), batch["dense"]], axis=1)
        H = hidden.shape[-1]

        experts = self.param("experts", NORMAL_INIT, (H, self.omoe_hidden_dim, self.n_expert))
        experts_bias = self.param("experts_bias", UNIFORM_INIT,
                                  (self.omoe_hidden_dim, self.n_expert))
        experts_out = jnp.einsum("ij,jkl->ikl", hidden, experts) + experts_bias
        if self.expert_activation is not None:
            experts_out = get_activation(self.expert_activation)(experts_out)

        gate = self.param("gate", UNIFORM_INIT, (self.n_expert, 1))
        gate = nn.softmax(gate, axis=0)
        gate_out = jnp.einsum("abc,cd->abd", experts_out, gate)[..., 0]  # [B, hidden]

        out = {}
        preds = []
        for i in range(self.num_task):
            p = TaskTower(self.hidden_dim, self.dropouts,
                          name=f"task_{i + 1}_dnn")(gate_out, train)
            preds.append(p)
            out[f"task{i + 1}_pred"] = p
        if train:
            out["loss"] = multi_task_bce(preds, batch["label"])
        return out
