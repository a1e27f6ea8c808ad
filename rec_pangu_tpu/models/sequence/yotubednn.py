"""YotubeDNN (parity: rec_pangu/models/sequence/yotubednn.py:11-47):
masked-mean pooling of history item embeddings."""
from __future__ import annotations

import jax.numpy as jnp

from ..base import SequenceModelBase, register_model


@register_model("YotubeDNN")
class YotubeDNN(SequenceModelBase):
    fused_update_compatible = True

    def setup(self):
        self.setup_base()

    def __call__(self, batch, train: bool = True):
        seq_emb = self.item_emb(batch["hist_item_list"], batch.get("emb_plan"))  # [B,L,D]
        mask = batch["hist_mask_list"][..., None].astype(seq_emb.dtype)
        user_emb = jnp.mean(seq_emb * mask, axis=1)
        out = {"user_emb": user_emb}
        if train:
            out["loss"] = self.calculate_loss(user_emb, batch["target_item"],
                                              batch.get("emb_plan"))
        return out
