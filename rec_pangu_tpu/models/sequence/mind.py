"""MIND (parity: rec_pangu/models/sequence/mind.py:12-62): capsule network
with shared bilinear projection (type 0) and gaussian-init routing logits."""
from __future__ import annotations

from ...ops.multi_interest import CapsuleNetwork
from ..base import SequenceModelBase, register_model
from .comirec import best_interest


@register_model("MIND")
class MIND(SequenceModelBase):
    # the target-item read feeds only argmax (no gradient) - see
    # best_interest; hist lookup + full-softmax CE are the captured paths
    fused_update_compatible = True

    def setup(self):
        self.setup_base()
        self.capsule = CapsuleNetwork(self.embedding_dim, self.max_length,
                                      bilinear_type=0,
                                      interest_num=int(self.config["K"]))

    def __call__(self, batch, train: bool = True):
        seq_emb = self.item_emb(batch["hist_item_list"], batch.get("emb_plan"))
        mask = batch["hist_mask_list"]
        multi_interest_emb = self.capsule(seq_emb, mask)
        out = {"user_emb": multi_interest_emb}
        if train:
            item = batch["target_item"]
            item_e = self.item_emb(item)
            best = best_interest(multi_interest_emb, item_e)
            out["loss"] = self.calculate_loss(best, item,
                                              batch.get("emb_plan"))
        return out
