"""AOANet (parity: rec_pangu/models/ranking/aoanet.py:14-115): DNN branch ++
GeneralizedInteractionNet (outer-product subspace fusion) -> Dense(1)."""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.embedding import FusedEmbedding
from ...ops.mlp import KERNEL_INIT, MLP
from ..base import RankModelBase, register_model
from ..losses import get_loss_fn


class GeneralizedInteraction(nn.Module):
    """One GIN layer (aoanet.py:97-115): B_{i+1}[b,o,:] built from outer
    products of B_0 fields with B_i subspaces, fused by alpha, W, h."""

    input_subspaces: int
    output_subspaces: int
    num_fields: int
    embedding_dim: int

    @nn.compact
    def __call__(self, b0: jnp.ndarray, bi: jnp.ndarray) -> jnp.ndarray:
        D = self.embedding_dim
        # The constructor's eye/ones inits are DEAD CODE in the reference:
        # reset_parameters() kaiming-overwrites every >=2D param
        # (base_model.py:42-59; aoanet.py:51 runs it), so W/alpha/h all
        # train from kaiming noise.  Replicated (r5 — the eye/ones port was
        # a measured -0.012 AUC on the 3-seed ratings leg).
        from ...ops.initializers import torch_kaiming_normal

        kaiming = torch_kaiming_normal()
        W = self.param("W", kaiming, (self.output_subspaces, D, D))
        alpha = self.param("alpha", kaiming,
                           (self.input_subspaces * self.num_fields, self.output_subspaces))
        h = self.param("h", kaiming, (self.output_subspaces, D, 1))
        # Reference math (aoanet.py:107-115): pair index n = s*F + f (torch
        # .repeat TILES, so both factors are subspace-major), outer products
        # [B, n, D, D] fused by alpha then W/h.  Materializing the outer
        # tensor is 8.6 GB at the bench shape (90 ms/step in HBM traffic);
        # contracting alpha INTO the product first is the same sum
        #   fusion[b,o,h,d] = sum_{s,f} alpha[s*F+f, o] b0[b,f,h] bi[b,s,d]
        # at ~0.6 ms with nothing bigger than [B, out, D, D] in flight.
        alpha3 = alpha.reshape(self.input_subspaces, self.num_fields,
                               self.output_subspaces)
        a1 = jnp.einsum("bfh,sfo->bsoh", b0, alpha3)
        fusion = jnp.einsum("bsoh,bsd->bohd", a1, bi)   # [B, out, D, D]
        g = W * jnp.swapaxes(h, 1, 2)                    # W[o,h,d] * h[o,d]
        return jnp.einsum("bohd,ohd->boh", fusion, g)    # [B, out, D]


@register_model("AOANet")
class AOANet(RankModelBase):
    enc_dict: Any = None
    embedding_dim: int = 32
    dnn_hidden_units: Sequence[int] = (64, 64, 64)
    num_interaction_layers: int = 3
    num_subspaces: int = 4
    loss_fun: str = "bce"

    @nn.compact
    def __call__(self, batch, train: bool = True):
        emb = FusedEmbedding(self.spec, self.embedding_dim)(batch["sparse"], batch.get("emb_plan"))
        dnn_input = jnp.concatenate([emb.reshape(emb.shape[0], -1), batch["dense"]], axis=1)
        dnn_out = MLP(self.dnn_hidden_units, output_dim=None)(dnn_input, train)
        bi = emb
        for i in range(self.num_interaction_layers):
            bi = GeneralizedInteraction(
                self.num_sparse if i == 0 else self.num_subspaces,
                self.num_subspaces, self.num_sparse, self.embedding_dim)(emb, bi)
        interact_out = bi.reshape(bi.shape[0], -1)
        logit = nn.Dense(1, kernel_init=KERNEL_INIT)(
            jnp.concatenate([dnn_out, interact_out], axis=-1))
        y_pred = nn.sigmoid(logit)
        out = {"pred": y_pred}
        if train:
            out["loss"] = get_loss_fn(self.loss_fun)(y_pred, batch["label"])
        return out
