"""NGCF (parity: rec_pangu/models/graph/ngcf.py:12-56 + base_model.py:227-280).

The reference's GraphBaseModel is broken (``__int__`` typo at
base_model.py:228 means its init never runs; README lists NGCF as ToDo) —
this is a working implementation of the same architecture: user/item tables,
stacked NGCF message-passing layers over the bipartite graph, concatenated
per-layer embeddings, BPR loss with L2 regularization
(create_bpr_loss, base_model.py:264-274).

Bipartite message passing is expressed with the dense normalized interaction
matrix R_norm [U, I]: messages to users come from ``R_norm @ item_h``,
messages to items from ``R_norm^T @ user_h`` — two MXU matmuls per layer.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.graph import NGCFLayer as _NGCFLayer
from ..base import register_model

KERNEL_INIT = nn.initializers.xavier_normal()


@register_model("NGCF")
class NGCF(nn.Module):
    num_user: int = 0
    num_item: int = 0
    embedding_dim: int = 64
    hidden_size: Sequence[int] = (64, 64)
    dropout: float = 0.1
    lmbd: float = 1e-5
    g: Any = None  # R_norm [U, I], set at construction (static)

    def setup(self):
        self.user_emb_layer = self.param(
            "user_emb", KERNEL_INIT, (self.num_user, self.embedding_dim))
        self.item_emb_layer = self.param(
            "item_emb", KERNEL_INIT, (self.num_item, self.embedding_dim))
        dims = [self.embedding_dim] + list(self.hidden_size)
        self.ngcf_layers = [
            _NGCFLayer(dims[i + 1], self.dropout) for i in range(len(dims) - 1)
        ]

    def __call__(self, batch, train: bool = True):
        r = jnp.asarray(self.g)
        user_h, item_h = self.user_emb_layer, self.item_emb_layer
        user_embeds = [user_h]
        item_embeds = [item_h]
        for layer in self.ngcf_layers:
            side_u = r @ item_h          # [U, D]
            side_i = r.T @ user_h        # [I, D]
            new_u = layer(side_u, user_h, train)
            new_i = layer(side_i, item_h, train)
            user_h, item_h = new_u, new_i
            user_embeds.append(user_h)
            item_embeds.append(item_h)
        user_embd = jnp.concatenate(user_embeds, axis=1)
        item_embd = jnp.concatenate(item_embeds, axis=1)

        out = {}
        if train:
            u = jnp.take(user_embd, batch["user_id"], axis=0)
            pos = jnp.take(item_embd, batch["pos_item_id"], axis=0)
            neg = jnp.take(item_embd, batch["neg_item_id"], axis=0)
            out["loss"] = self._bpr_loss(u, pos, neg)
        else:
            out["user_emb"] = user_embd
            out["item_emb"] = item_embd
        return out

    def _bpr_loss(self, users, pos_items, neg_items):
        pos_scores = jnp.sum(users * pos_items, axis=1)
        neg_scores = jnp.sum(users * neg_items, axis=1)
        mf_loss = -jnp.mean(nn.log_sigmoid(pos_scores - neg_scores))
        regularizer = (jnp.sum(users**2) + jnp.sum(pos_items**2)
                       + jnp.sum(neg_items**2)) / 2
        emb_loss = self.lmbd * regularizer / users.shape[0]
        return mf_loss + emb_loss
