"""SRGNN / GCSAN / NISER session-graph models (parity:
rec_pangu/models/sequence/srgnn.py:14-75, gcsan.py:14-91, niser.py:15-87).

Session graphs are built on device with fixed shapes (ops/graph.py) instead of
the reference's host-side DGL batch graph (models/utils.py:196-269).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...ops.graph import (SRGNNCell, adj_from_alias, build_session_graph,
                          take_nodes)
from ...ops.sequence_enc import KERNEL_INIT, TransformerEncoder
from ...ops.numerics import safe_l2norm
from ..base import SequenceModelBase, register_model



class _SRGNNReadout(nn.Module):
    """Attention readout (srgnn.py:57-66): alpha = v^T sigmoid(W1 ht + W2 h_t);
    session = W [sum(alpha * h * mask); ht]."""

    dim: int

    @nn.compact
    def __call__(self, seq_hidden, ht, mask):
        q1 = nn.Dense(self.dim, kernel_init=KERNEL_INIT, name="linear_one")(ht)[:, None, :]
        q2 = nn.Dense(self.dim, kernel_init=KERNEL_INIT, name="linear_two")(seq_hidden)
        alpha = nn.Dense(1, use_bias=False, kernel_init=KERNEL_INIT,
                         name="linear_three")(nn.sigmoid(q1 + q2))
        a = jnp.sum(alpha * seq_hidden * mask[..., None], axis=1)
        return nn.Dense(self.dim, kernel_init=KERNEL_INIT, name="linear_transform")(
            jnp.concatenate([a, ht], axis=1))


@register_model("SRGNN")
class SRGNN(SequenceModelBase):
    # The trainer/bench attach a host-built session graph (graph_nodes /
    # graph_alias, ops/graph.attach_session_graph) plus an embedding sort
    # plan over graph_nodes — the only table uses are then the planned node
    # lookup + the full-softmax CE, so the fused table-Adam step applies.
    session_graph = True
    fused_update_compatible = True
    fused_lookup_key = "graph_nodes"

    def setup(self):
        self.setup_base()
        self.step = int(self.config.get("step", 1))
        self.gnncell = SRGNNCell(self.embedding_dim)
        self.readout = _SRGNNReadout(self.embedding_dim)

    def _graph_parts(self, batch):
        """(nodes, alias, M_in, M_out, plan): host-plan path when the batch
        carries graph_nodes (the unique/alias build already happened on
        host and the lookup plan refers to those ids), on-device build
        otherwise (plain model.apply callers)."""
        mask = batch["hist_mask_list"]
        if "graph_nodes" in batch:
            nodes, alias = batch["graph_nodes"], batch["graph_alias"]
            m_in, m_out = adj_from_alias(alias, mask)
            return nodes, alias, m_in, m_out, batch.get("emb_plan")
        nodes, alias, m_in, m_out = build_session_graph(
            batch["hist_item_list"], mask)
        return nodes, alias, m_in, m_out, None

    def _gnn_seq_hidden(self, batch):
        nodes, alias, m_in, m_out, plan = self._graph_parts(batch)
        hidden = self.item_emb(nodes, plan)
        for _ in range(self.step):
            hidden = self.gnncell(m_in, m_out, hidden)
        return take_nodes(hidden, alias)

    def __call__(self, batch, train: bool = True):
        mask = batch["hist_mask_list"]
        lengths = jnp.sum(mask, axis=-1).astype(jnp.int32)
        seq_hidden = self._gnn_seq_hidden(batch)
        ht = self.gather_indexes(seq_hidden, jnp.clip(lengths - 1, 0, None))
        seq_output = self.readout(seq_hidden, ht, mask)
        out = {"user_emb": seq_output}
        if train:
            out["loss"] = self.calculate_loss(seq_output, batch["target_item"],
                                              batch.get("emb_plan"))
        return out


@register_model("GCSAN")
class GCSAN(SRGNN):
    def setup(self):
        super().setup()  # GNN wiring shared with SRGNN (readout goes unused)
        cfg = self.config
        self.weight = float(cfg.get("weight", 0.1))
        self.self_attention = TransformerEncoder(
            n_layers=int(cfg.get("n_layers", 2)),
            n_heads=int(cfg.get("n_heads", 4)),
            inner_size=int(cfg.get("inner_size", 32)),
            hidden_dropout_prob=float(cfg.get("hidden_dropout_prob", 0.1)),
            attn_dropout_prob=float(cfg.get("attn_dropout_prob", 0.1)),
            hidden_act=cfg.get("hidden_act", "gelu"),
            layer_norm_eps=float(cfg.get("layer_norm_eps", 0.001)),
        )

    def __call__(self, batch, train: bool = True):
        mask = batch["hist_mask_list"]
        lengths = jnp.sum(mask, axis=-1).astype(jnp.int32)
        seq_hidden = self._gnn_seq_hidden(batch)
        idx = jnp.clip(lengths - 1, 0, None)
        ht = self.gather_indexes(seq_hidden, idx)
        attn_mask = self.get_attention_mask(mask.astype(seq_hidden.dtype))
        output = self.self_attention(seq_hidden, attn_mask, train,
                                     key_valid=mask, causal=True)
        at = self.gather_indexes(output, idx)
        seq_output = self.weight * at + (1 - self.weight) * ht
        out = {"user_emb": seq_output}
        if train:
            out["loss"] = self.calculate_loss(seq_output, batch["target_item"],
                                              batch.get("emb_plan"))
        return out


@register_model("NISER")
class NISER(SRGNN):
    def setup(self):
        super().setup()  # GNN wiring + readout shared with SRGNN
        cfg = self.config
        self.item_dropout = nn.Dropout(float(cfg.get("item_dropout", 0.1)))
        self.pos_embedding = self.param(
            "pos_embedding", KERNEL_INIT, (self.max_length, self.embedding_dim))

    def __call__(self, batch, train: bool = True):
        mask = batch["hist_mask_list"]
        lengths = jnp.sum(mask, axis=-1).astype(jnp.int32)
        nodes, alias, m_in, m_out, plan = self._graph_parts(batch)
        hidden = self.item_emb(nodes, plan)
        hidden = self.item_dropout(hidden, deterministic=not train)
        hidden = safe_l2norm(hidden)
        for _ in range(self.step):
            hidden = self.gnncell(m_in, m_out, hidden)
        seq_hidden = take_nodes(hidden, alias)
        seq_hidden = seq_hidden + self.pos_embedding[None, : seq_hidden.shape[1]]
        ht = self.gather_indexes(seq_hidden, jnp.clip(lengths - 1, 0, None))
        seq_output = safe_l2norm(self.readout(seq_hidden, ht, mask))
        out = {"user_emb": seq_output}
        if train:
            out["loss"] = self.calculate_loss(seq_output, batch["target_item"],
                                              batch.get("emb_plan"))
        return out
