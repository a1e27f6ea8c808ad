"""AFN (parity: rec_pangu/models/ranking/afn.py:14-102): logarithmic neuron
network (log -> linear over fields -> exp) + optional ensemble DNN with its
own second embedding table, fused by a final Dense(2->1)."""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.embedding import FusedEmbedding
from ...ops.mlp import KERNEL_INIT, MLP
from ..base import RankModelBase, register_model
from ..losses import get_loss_fn


@register_model("AFN")
class AFN(RankModelBase):
    enc_dict: Any = None
    embedding_dim: int = 32
    dnn_hidden_units: Sequence[int] = (64, 64, 64)
    afn_hidden_units: Sequence[int] = (64, 64, 64)
    ensemble_dnn: bool = True
    logarithmic_neurons: int = 5
    loss_fun: str = "bce"

    @nn.compact
    def __call__(self, batch, train: bool = True):
        emb = FusedEmbedding(self.spec, self.embedding_dim)(batch["sparse"], batch.get("emb_plan"))  # [B,F,D]
        # logarithmic net (afn.py:91-102).  torch BatchNorm1d(num_fields) on a
        # [B, F, D] tensor normalizes the FIELD axis; transpose so flax's
        # last-axis BatchNorm matches.
        x = jnp.clip(jnp.abs(emb), 1e-5, None)
        log_x = jnp.log(x)
        log_x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name="log_bn")(log_x.transpose(0, 2, 1)).transpose(0, 2, 1)
        log_out = nn.Dense(self.logarithmic_neurons, use_bias=False,
                           kernel_init=KERNEL_INIT)(log_x.transpose(0, 2, 1)).transpose(0, 2, 1)
        cross = jnp.exp(log_out)  # [B, neurons, D]
        cross = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name="exp_bn")(cross.transpose(0, 2, 1)).transpose(0, 2, 1)
        afn_out = MLP(self.afn_hidden_units, output_dim=1)(
            cross.reshape(cross.shape[0], -1), train)
        if self.ensemble_dnn:
            emb2 = FusedEmbedding(self.spec, self.embedding_dim, name="embedding2")(
                batch["sparse"], batch.get("emb_plan"))
            dnn_out = MLP(self.dnn_hidden_units, output_dim=1)(
                emb2.reshape(emb2.shape[0], -1), train)
            logit = nn.Dense(1, kernel_init=KERNEL_INIT)(
                jnp.concatenate([afn_out, dnn_out], axis=-1))
        else:
            logit = afn_out
        y_pred = nn.sigmoid(logit)
        out = {"pred": y_pred}
        if train:
            out["loss"] = get_loss_fn(self.loss_fun)(y_pred, batch["label"])
        return out
