"""MLMMOE (parity: rec_pangu/models/multi_task/mlmmoe.py:12-143): two-level
gating — per-expert input-independent level gates over the expert bank, then
per-task input-dependent gates over the level outputs."""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.activations import get_activation
from ...ops.embedding import FusedEmbedding
from ..base import RankModelBase, register_model
from .common import TaskTower, multi_task_bce
from .mmoe import NORMAL_INIT, UNIFORM_INIT


@register_model("MLMMOE")
class MLMMOE(RankModelBase):
    enc_dict: Any = None
    num_task: int = 2
    n_expert: int = 3
    embedding_dim: int = 40
    mmoe_hidden_dim: int = 128
    expert_activation: Optional[str] = None
    hidden_dim: Sequence[int] = (128, 64)
    dropouts: Sequence[float] = (0.2, 0.2)

    @nn.compact
    def __call__(self, batch, train: bool = True):
        emb = FusedEmbedding(self.spec, self.embedding_dim,
                             init_mode="xavier")(batch["sparse"], batch.get("emb_plan"))
        hidden = jnp.concatenate([emb.reshape(emb.shape[0], -1), batch["dense"]], axis=1)
        H = hidden.shape[-1]

        experts = self.param("experts", NORMAL_INIT, (H, self.mmoe_hidden_dim, self.n_expert))
        experts_bias = self.param("experts_bias", UNIFORM_INIT,
                                  (self.mmoe_hidden_dim, self.n_expert))
        experts_out = jnp.einsum("ij,jkl->ikl", hidden, experts) + experts_bias
        if self.expert_activation is not None:
            experts_out = get_activation(self.expert_activation)(experts_out)

        # level-two gates: E input-independent gates, each a softmax over the
        # source-expert axis (mlmmoe.py:41,86-91): level_out[:,:,d] = experts_out @ G[d]
        level_gates = self.param("level_gates", UNIFORM_INIT, (self.n_expert, self.n_expert))
        G = nn.softmax(level_gates, axis=1)  # [E_out, E_in]
        level_out = jnp.einsum("bkc,dc->bkd", experts_out, G)

        out = {}
        preds = []
        for i in range(self.num_task):
            gate_w = self.param(f"gate_{i + 1}", NORMAL_INIT, (H, self.n_expert))
            gate_b = self.param(f"gate_bias_{i + 1}", UNIFORM_INIT, (self.n_expert,))
            gate = nn.softmax(hidden @ gate_w + gate_b, axis=-1)
            mixed = jnp.einsum("bke,be->bk", level_out, gate)
            p = TaskTower(self.hidden_dim, self.dropouts,
                          name=f"task_{i + 1}_dnn")(mixed, train)
            preds.append(p)
            out[f"task{i + 1}_pred"] = p
        if train:
            out["loss"] = multi_task_bce(preds, batch["label"])
        return out
