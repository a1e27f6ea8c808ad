"""CLRec (parity: rec_pangu/models/sequence/clrec.py:15-102): BERT4Rec encoder
+ full-softmax loss + user/target-item InfoNCE."""
from __future__ import annotations

import jax.numpy as jnp

from ...ops.sequence_enc import BERT4RecEncoder
from ...ops.numerics import safe_l2norm
from ..base import SequenceModelBase, register_model
from .contra_losses import clrec_contra_loss



@register_model("CLRec")
class CLRec(SequenceModelBase):
    # Both gradient-carrying table reads (hist + the contrastive target-item
    # read) ride ONE host plan over batch["lookup_all"] = [hist | target]
    # (r5), so the fused table-Adam path applies; the CE grad is captured as
    # usual.
    fused_update_compatible = True
    fused_lookup_key = "lookup_all"
    lookup_extra = ("target_item",)

    def setup(self):
        self.setup_base()
        self.temp = float(self.config.get("temp", 0.1))
        self.encoder = BERT4RecEncoder(self.max_length, num_layers=2, num_heads=2)

    def __call__(self, batch, train: bool = True):
        lengths = jnp.sum(batch["hist_mask_list"], axis=1).astype(jnp.int32)
        hist = batch["hist_item_list"]
        L = hist.shape[1]
        if train and "lookup_all" in batch:
            emb = self.item_emb(batch["lookup_all"], batch.get("emb_plan"))
            seq_emb, target_emb = emb[:, :L], emb[:, L]
        else:
            seq_emb = self.item_emb(hist, batch.get("emb_plan"))
            target_emb = None
        user_emb = self.encoder(seq_emb, lengths, train)
        out = {"user_emb": user_emb}
        if train:
            item = batch["target_item"]
            if target_emb is None:
                target_emb = self.item_emb(item)
            features = safe_l2norm(jnp.stack([user_emb, target_emb], axis=1))
            out["loss"] = self.calculate_loss(user_emb, item,
                                              batch.get("emb_plan")) + \
                clrec_contra_loss(features, self.temp)
        return out
