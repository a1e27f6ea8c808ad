"""Re4 (parity: rec_pangu/models/sequence/re4.py:15-155): interest proposals
plus re-attend / re-contrast / re-construct auxiliary losses.

Deviation from the reference (documented): re4.py:59 computes
``item_seq_len = sum(1 - mask)`` — the PADDING count — and then uses
``1/len`` as the positive-selection gate, which divides by zero for
full-length sequences.  We use the true sequence length.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...ops.initializers import torch_kaiming_normal
from ...ops.numerics import safe_l2norm
from ..base import SequenceModelBase, register_model
from .comirec import best_interest

# reference constructors use torch.randn, but reset_parameters() overwrites
# every >=2D param with kaiming-normal (base_model.py:42-59; re4.py calls it)
TORCH_KAIMING = torch_kaiming_normal()
KERNEL_INIT = nn.initializers.variance_scaling(2.0, "fan_in", "normal")



@register_model("Re4")
class Re4(SequenceModelBase):
    # table uses: planned hist lookup + full-softmax CE (both captured) +
    # the target-item read, which feeds only best_interest's argmax
    # (gradient-free — see ComirecSA)
    fused_update_compatible = True

    def setup(self):
        self.setup_base()
        cfg = self.config
        D, L = self.embedding_dim, self.max_length
        self.K = int(cfg.get("K", 4))
        self.att_thre = float(cfg.get("att_thre", -1))
        self.t_cont = float(cfg.get("t_cont", 0.02))
        self.att_lambda = float(cfg.get("att_lambda", 0.01))
        self.ct_lambda = float(cfg.get("ct_lambda", 0.1))
        self.cs_lambda = float(cfg.get("cs_lambda", 0.1))
        self.W1 = self.param("W1", TORCH_KAIMING, (256, D))
        self.W1_2 = self.param("W1_2", TORCH_KAIMING, (self.K, 256))
        self.W2 = self.param("W2", TORCH_KAIMING, (D, D))
        self.W3 = self.param("W3", TORCH_KAIMING, (D, D))
        self.W3_2 = self.param("W3_2", TORCH_KAIMING, (L, D))
        self.W5 = self.param("W5", TORCH_KAIMING, (D, D))
        self.fc1 = nn.Dense(D, kernel_init=KERNEL_INIT)
        self.fc_cons = nn.Dense(D * L, kernel_init=KERNEL_INIT)

    def __call__(self, batch, train: bool = True):
        item_seq = batch["hist_item_list"]
        mask = batch["hist_mask_list"]            # 1 at valid
        pad = (1.0 - mask).astype(bool)           # True at padding
        B, L = item_seq.shape
        K, D = self.K, self.embedding_dim
        seq_emb = self.item_emb(item_seq, batch.get("emb_plan"))  # [B, L, D]

        # interest proposals (re4.py:64-68)
        logits = jnp.einsum("kr,rd,bld->bkl", self.W1_2, self.W1, seq_emb)
        logits = jnp.where(pad[:, None, :], -1e9, logits)
        proposals_weight = nn.softmax(logits, axis=2)
        user_interests = jnp.einsum("bkl,bld->bkd", proposals_weight,
                                    seq_emb @ self.W2)

        if not train:
            return {"user_emb": jnp.tanh(self.fc1(user_interests))}

        target_item = batch["target_item"]
        item_e = self.item_emb(target_item)

        # re-attend (re4.py:71-76)
        product = jnp.einsum("bkd,bld->bkl", user_interests, seq_emb)
        product = jnp.where(pad[:, None, :], -1e9, product)
        re_att = nn.softmax(product, axis=2)
        att_pred = nn.log_softmax(logits, axis=-1)
        loss_attend = -jnp.sum(re_att * att_pred) / jnp.sum(re_att)

        # re-contrast (re4.py:79-106)
        ni = safe_l2norm(user_interests)
        ne = safe_l2norm(seq_emb)
        cos_sim = jnp.einsum("bkd,bld->bkl", ni, ne)
        true_len = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
        if self.att_thre == -1:
            gate = (1.0 / true_len)[:, None, None]
        else:
            gate = jnp.full((B, 1, 1), self.att_thre)
        positive_idx = proposals_weight > gate                      # [B,K,L]
        mask_cos = jnp.where(pad[:, None, :], -1e9, cos_sim)
        pos_cos = jnp.where(~positive_idx, -1e9, mask_cos)
        cons_pos = jnp.exp(pos_cos / self.t_cont)
        cons_neg = jnp.sum(jnp.exp(mask_cos / self.t_cont), axis=2)
        in2in = jnp.einsum("bkd,bjd->bkj", ni, ni)
        in2in = jnp.where(jnp.eye(K, dtype=bool)[None], -1e9, in2in)
        cons_neg = cons_neg + jnp.sum(jnp.exp(in2in / self.t_cont), axis=2)
        item_rolled = jnp.roll(ne, 1, axis=0)
        in2i = jnp.einsum("bkd,bld->bkl", ni, item_rolled)
        in2i_mask = jnp.roll(item_seq == 0, 1, axis=0)
        in2i = jnp.where(in2i_mask[:, None, :], -1e9, in2i)
        cons_neg = cons_neg + jnp.sum(jnp.exp(in2i / self.t_cont), axis=2)
        cons_div = cons_pos / cons_neg[..., None]
        cons_div = jnp.where(pad[:, None, :], 1.0, cons_div)
        cons_div = jnp.where(~positive_idx, 1.0, cons_div)
        loss_contrastive = jnp.mean(-jnp.log(cons_div))

        # re-construct (re4.py:109-124)
        recons = self.fc_cons(user_interests)                      # [B,K,D*L]
        recons = recons.reshape(B * K, L, D)
        # recons_weight[b,i,j] = W3_2[i] . tanh(W3 @ recons[b,j])  (re4.py:111-113)
        rw = jnp.einsum("ie,bej->bij", self.W3_2, jnp.tanh(
            jnp.einsum("ed,bjd->bej", self.W3, recons)))
        rw = rw.reshape(B, K, L, L)
        rw = jnp.where((item_seq == 0)[:, None, None, :], -1e9, rw).reshape(B * K, L, L)
        rw = nn.softmax(rw, axis=-1)
        recons_item = jnp.einsum("bij,bjd->bid", rw, recons @ self.W5).reshape(B, K, L, D)
        target_emb = jnp.broadcast_to(seq_emb[:, None], (B, K, L, D))
        sq = (recons_item - target_emb) ** 2
        sq = jnp.where(~positive_idx[..., None], 0.0, sq)
        sq = jnp.where(pad[:, None, :, None], 0.0, sq)
        loss_construct = jnp.mean(sq)

        user_interests = jnp.tanh(self.fc1(user_interests))
        best = best_interest(user_interests, item_e)
        loss = self.calculate_loss(best, target_item, batch.get("emb_plan"))
        loss = loss + self.att_lambda * loss_attend + \
            self.ct_lambda * loss_contrastive + self.cs_lambda * loss_construct
        return {"user_emb": user_interests, "loss": loss}
