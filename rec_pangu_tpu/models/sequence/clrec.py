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
    def setup(self):
        self.setup_base()
        self.temp = float(self.config.get("temp", 0.1))
        self.encoder = BERT4RecEncoder(self.max_length, num_layers=2, num_heads=2)

    def __call__(self, batch, train: bool = True):
        lengths = jnp.sum(batch["hist_mask_list"], axis=1).astype(jnp.int32)
        seq_emb = self.item_emb(batch["hist_item_list"], batch.get("emb_plan"))
        user_emb = self.encoder(seq_emb, lengths, train)
        out = {"user_emb": user_emb}
        if train:
            item = batch["target_item"]
            target_emb = self.item_emb(item)
            features = safe_l2norm(jnp.stack([user_emb, target_emb], axis=1))
            out["loss"] = self.calculate_loss(user_emb, item) + \
                clrec_contra_loss(features, self.temp)
        return out
