"""ComiRec-SA / ComiRec-DR (parity: rec_pangu/models/sequence/comirec.py:12-118).

Training picks the argmax-scoring interest per sample — vectorized with
take_along_axis instead of the reference's per-sample Python loop
(comirec.py:47-51, SURVEY.md §7.1 fixed shapes).
"""
from __future__ import annotations

import jax.numpy as jnp

from ...ops.multi_interest import CapsuleNetwork, MultiInterestSelfAttention
from ..base import SequenceModelBase, register_model


def best_interest(multi_interest_emb: jnp.ndarray, item_e: jnp.ndarray) -> jnp.ndarray:
    """[B,K,D], [B,D] -> the interest with max inner product per sample [B,D]."""
    scores = jnp.einsum("bke,be->bk", multi_interest_emb, item_e)
    k_index = jnp.argmax(scores, axis=1)
    return jnp.take_along_axis(
        multi_interest_emb,
        k_index[:, None, None].repeat(multi_interest_emb.shape[-1], axis=2),
        axis=1)[:, 0]


@register_model("ComirecSA")
class ComirecSA(SequenceModelBase):
    # the target-item read feeds only argmax (no gradient) - see
    # best_interest; hist lookup + full-softmax CE are the captured paths
    fused_update_compatible = True

    def setup(self):
        self.setup_base()
        self.multi_interest_sa = MultiInterestSelfAttention(
            num_interests=int(self.config["K"]))

    def __call__(self, batch, train: bool = True):
        seq_emb = self.item_emb(batch["hist_item_list"], batch.get("emb_plan"))
        mask = batch["hist_mask_list"][..., None]
        multi_interest_emb = self.multi_interest_sa(seq_emb, mask)  # [B,K,D]
        out = {"user_emb": multi_interest_emb}
        if train:
            item = batch["target_item"]
            item_e = self.item_emb(item)
            best = best_interest(multi_interest_emb, item_e)
            out["loss"] = self.calculate_loss(best, item,
                                              batch.get("emb_plan"))
        return out


@register_model("ComirecDR")
class ComirecDR(SequenceModelBase):
    # the target-item read feeds only argmax (no gradient) - see
    # best_interest; hist lookup + full-softmax CE are the captured paths
    fused_update_compatible = True

    def setup(self):
        self.setup_base()
        self.capsule = CapsuleNetwork(self.embedding_dim, self.max_length,
                                      bilinear_type=2,
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
