"""FiGNN field-graph layers (parity: rec_pangu/models/layers/graph.py:14-84).

Unused by the reference's shipped models but part of its layer library; kept
for the same extension surface.  Per-field [F, D, D] weight applications are
single einsums; the attention adjacency masks self-loops with -inf.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

XAVIER_INIT = nn.initializers.xavier_normal()
KERNEL_INIT = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class GraphLayer(nn.Module):
    num_fields: int
    embedding_dim: int

    @nn.compact
    def __call__(self, g: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        D = self.embedding_dim
        W_in = self.param("W_in", XAVIER_INIT, (self.num_fields, D, D))
        W_out = self.param("W_out", XAVIER_INIT, (self.num_fields, D, D))
        bias_p = self.param("bias_p", nn.initializers.zeros, (D,))
        h_out = jnp.einsum("fde,bfe->bfd", W_out, h)
        aggr = jnp.einsum("bfg,bgd->bfd", g, h_out)
        return jnp.einsum("fde,bfe->bfd", W_in, aggr) + bias_p


class FiGNNLayer(nn.Module):
    num_fields: int
    embedding_dim: int
    gnn_layers: int = 3
    reuse_graph_layer: bool = False
    use_gru: bool = True
    use_residual: bool = True

    @nn.compact
    def __call__(self, feature_emb: jnp.ndarray) -> jnp.ndarray:
        F_, D = self.num_fields, self.embedding_dim
        # attention adjacency over all field pairs, self-loops masked
        w_attn = nn.Dense(1, use_bias=False, kernel_init=KERNEL_INIT, name="W_attn")
        src = jnp.repeat(feature_emb, F_, axis=1)                 # [B, F*F, D]
        dst = jnp.tile(feature_emb, (1, F_, 1))                   # [B, F*F, D]
        alpha = nn.leaky_relu(w_attn(jnp.concatenate([src, dst], axis=-1))[..., 0],
                              negative_slope=0.01)
        alpha = alpha.reshape(-1, F_, F_)
        alpha = jnp.where(jnp.eye(F_, dtype=bool)[None], -jnp.inf, alpha)
        g = nn.softmax(alpha, axis=-1)

        if self.reuse_graph_layer:
            layers = [GraphLayer(F_, D, name="gnn")] * self.gnn_layers
        else:
            layers = [GraphLayer(F_, D, name=f"gnn_{i}")
                      for i in range(self.gnn_layers)]
        gru = nn.GRUCell(features=D, name="gru") if self.use_gru else None

        h = feature_emb
        for layer in layers:
            a = layer(g, h)
            if gru is not None:
                h_flat, _ = gru(h.reshape(-1, D), a.reshape(-1, D))
                h = h_flat.reshape(-1, F_, D)
            else:
                h = a + h
            if self.use_residual:
                h = h + feature_emb
        return h
