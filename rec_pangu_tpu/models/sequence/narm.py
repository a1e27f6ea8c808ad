"""NARM (parity: rec_pangu/models/sequence/narm.py:12-75): GRU + global (last
hidden) / local (attention) session encoders -> concat -> Dense."""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...ops.sequence_enc import GRU, KERNEL_INIT
from ..base import SequenceModelBase, register_model


@register_model("NARM")
class NARM(SequenceModelBase):
    fused_update_compatible = True

    def setup(self):
        self.setup_base()
        self.n_layers = int(self.config.get("n_layers", 2))
        self.dropout_probs = list(self.config.get("dropout_probs", [0.1, 0.1]))
        self.hidden_size = int(self.config.get("hidden_size", 32))
        self.gru = GRU(self.hidden_size, self.n_layers, use_bias=False)
        self.a_1 = nn.Dense(self.hidden_size, use_bias=False, kernel_init=KERNEL_INIT)
        self.a_2 = nn.Dense(self.hidden_size, use_bias=False, kernel_init=KERNEL_INIT)
        self.v_t = nn.Dense(1, use_bias=False, kernel_init=KERNEL_INIT)
        self.b = nn.Dense(self.embedding_dim, use_bias=False, kernel_init=KERNEL_INIT)
        self.emb_dropout = nn.Dropout(self.dropout_probs[0])
        self.ct_dropout = nn.Dropout(self.dropout_probs[1])

    def __call__(self, batch, train: bool = True):
        item_seq = batch["hist_item_list"]
        lengths = jnp.sum(batch["hist_mask_list"], axis=1).astype(jnp.int32)
        seq_emb = self.item_emb(item_seq, batch.get("emb_plan"))
        seq_emb = self.emb_dropout(seq_emb, deterministic=not train)
        # reference runs an UNPACKED GRU (padding steps processed, narm.py:47)
        gru_out, _ = self.gru(seq_emb)
        idx = jnp.clip(lengths - 1, 0, gru_out.shape[1] - 1)
        ht = jnp.take_along_axis(
            gru_out, idx[:, None, None].repeat(gru_out.shape[-1], axis=2), axis=1)[:, 0]
        c_global = ht
        mask = (item_seq > 0)[..., None].astype(gru_out.dtype)
        q1 = self.a_1(gru_out)
        q2 = self.a_2(ht)[:, None, :]
        alpha = self.v_t(mask * nn.sigmoid(q1 + q2))
        c_local = jnp.sum(alpha * gru_out, axis=1)
        c_t = jnp.concatenate([c_local, c_global], axis=1)
        c_t = self.ct_dropout(c_t, deterministic=not train)
        user_emb = self.b(c_t)
        out = {"user_emb": user_emb}
        if train:
            out["loss"] = self.calculate_loss(user_emb, batch["target_item"],
                                              batch.get("emb_plan"))
        return out
