"""NextItNet (parity: rec_pangu/models/sequence/nextitnet.py:12-59)."""
from __future__ import annotations

import jax.numpy as jnp

from ...ops.conv import NextItNetLayer
from ..base import SequenceModelBase, register_model


@register_model("NextItNet")
class NextItNet(SequenceModelBase):
    fused_update_compatible = True

    def setup(self):
        self.setup_base()
        cfg = self.config
        self.nextit_layer = NextItNetLayer(
            self.embedding_dim,
            dilations=cfg.get("dilations", None),
            one_masked=bool(cfg.get("one_masked", False)),
            kernel_size=int(cfg.get("kernel_size", 3)),
            feat_drop=float(cfg.get("feat_drop", 0)),
        )

    def __call__(self, batch, train: bool = True):
        lengths = jnp.sum(batch["hist_mask_list"], axis=1).astype(jnp.int32)
        seq_emb = self.item_emb(batch["hist_item_list"], batch.get("emb_plan"))
        user_emb = self.nextit_layer(seq_emb, lengths, train)
        out = {"user_emb": user_emb}
        if train:
            out["loss"] = self.calculate_loss(user_emb, batch["target_item"],
                                              batch.get("emb_plan"))
        return out
