"""STAMP (parity: rec_pangu/models/sequence/stamp.py:12-59)."""
from __future__ import annotations

import jax.numpy as jnp

from ...ops.sequence_enc import STAMPLayer
from ..base import SequenceModelBase, register_model


@register_model("STAMP")
class STAMP(SequenceModelBase):
    fused_update_compatible = True

    def setup(self):
        self.setup_base()
        self.stamp_layer = STAMPLayer(self.embedding_dim,
                                      feat_drop=float(self.config.get("feat_drop", 0)))

    def __call__(self, batch, train: bool = True):
        lengths = jnp.sum(batch["hist_mask_list"], axis=1).astype(jnp.int32)
        seq_emb = self.item_emb(batch["hist_item_list"], batch.get("emb_plan"))
        user_emb = self.stamp_layer(seq_emb, lengths, train)
        out = {"user_emb": user_emb}
        if train:
            out["loss"] = self.calculate_loss(user_emb, batch["target_item"],
                                              batch.get("emb_plan"))
        return out
