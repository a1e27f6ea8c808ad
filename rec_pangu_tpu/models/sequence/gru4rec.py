"""GRU4Rec (parity: rec_pangu/models/sequence/gru4rec.py:12-46)."""
from __future__ import annotations

import jax.numpy as jnp

from ...ops.sequence_enc import GRU4RecEncoder
from ..base import SequenceModelBase, register_model


@register_model("GRU4Rec")
class GRU4Rec(SequenceModelBase):
    fused_update_compatible = True

    def setup(self):
        self.setup_base()
        self.gru = GRU4RecEncoder(self.embedding_dim, num_layers=2)

    def __call__(self, batch, train: bool = True):
        seq_emb = self.item_emb(batch["hist_item_list"], batch.get("emb_plan"))
        lengths = jnp.sum(batch["hist_mask_list"], axis=1).astype(jnp.int32)
        user_emb = self.gru(seq_emb, lengths)
        out = {"user_emb": user_emb}
        if train:
            out["loss"] = self.calculate_loss(user_emb, batch["target_item"],
                                              batch.get("emb_plan"))
        return out
