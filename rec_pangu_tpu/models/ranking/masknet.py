"""MaskNet (parity: rec_pangu/models/ranking/masknet.py:13-87): parallel or
serial MaskBlocks over [flattened embeddings ++ dense] -> MLP."""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.embedding import FusedEmbedding
from ...ops.interactions import MaskBlock
from ...ops.mlp import MLP
from ..base import RankModelBase, register_model
from ..losses import get_loss_fn


@register_model("MaskNet")
class MaskNet(RankModelBase):
    enc_dict: Any = None
    embedding_dim: int = 32
    block_num: int = 3
    use_parallel: bool = True
    reduction_factor: float = 0.3
    hidden_units: Sequence[int] = (64, 64, 64)
    loss_fun: str = "bce"

    @nn.compact
    def __call__(self, batch, train: bool = True):
        emb = FusedEmbedding(self.spec, self.embedding_dim)(batch["sparse"], batch.get("emb_plan"))
        dnn_input = jnp.concatenate([emb.reshape(emb.shape[0], -1), batch["dense"]], axis=1)
        input_dim = dnn_input.shape[-1]
        blocks = [MaskBlock(input_dim, self.reduction_factor)
                  for _ in range(self.block_num)]
        if self.use_parallel:
            outs = [blk(dnn_input, dnn_input) for blk in blocks]
            mask_output = jnp.mean(jnp.stack(outs, axis=1), axis=1)
        else:
            mask_output = dnn_input
            for blk in blocks:
                mask_output = blk(mask_output, dnn_input)
        y_pred = nn.sigmoid(MLP(self.hidden_units, output_dim=1)(mask_output, train))
        out = {"pred": y_pred}
        if train:
            out["loss"] = get_loss_fn(self.loss_fun)(y_pred, batch["label"])
        return out
