"""CMI (parity: rec_pangu/models/sequence/cmi.py:14-194): global interest bank
+ GRU personal embedding, InfoNCE-style loss with sampled negatives.

The reference re-normalizes the item/interest tables IN PLACE under no_grad
at every forward (cmi.py:62-69) — projected optimization.  The functional
equivalent here: ``renorm_param_paths`` has the trainer L2-project both
stored tables after every step (identical to projecting before the next
forward), and reads apply ``w / stop_grad(||w||)`` — an identity on the
projected weights that also keeps raw step functions (tests/bench) on the
unit-sphere semantics.  Activation normalizations (psnl_interest,
full_psnl, the clloss views) are DIFFERENTIABLE, matching the reference's
in-graph F.normalize calls.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.numerics import safe_l2norm
from ...ops.sequence_enc import GRU, KERNEL_INIT
from ..base import SequenceModelBase, register_model

NORMAL_INIT = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def _stopgrad_norm(w: jnp.ndarray, axis=-1, eps=1e-12) -> jnp.ndarray:
    n = jnp.linalg.norm(w, axis=axis, keepdims=True)
    return w / jax.lax.stop_gradient(jnp.maximum(n, eps))


@register_model("CMI")
class CMI(SequenceModelBase):
    # All three gradient-carrying table reads (hist, positive target,
    # sampled negatives) are per-row, and row-norm commutes with the gather
    # (norm is over the last axis), so they ride ONE host plan over
    # batch["lookup_all"] = [hist | target | host-sampled negs] (r5).  The
    # loss has no full-softmax term -> no dense CE capture stream.
    fused_update_compatible = True
    fused_lookup_key = "lookup_all"
    lookup_extra = ("target_item", "neg_items")
    host_negatives = True
    fused_uses_ce = False
    # the reference renormalizes BOTH tables in-place every forward
    # (cmi.py:62-69) — projected optimization, not just normalized reads;
    # the trainer applies the projection between steps (exact equivalent)
    renorm_param_paths = (("item_emb", "table"), ("interest_embedding",))

    def setup(self):
        self.setup_base()
        cfg = self.config
        D = self.embedding_dim
        self.num_layers = int(cfg.get("num_layers", 2))
        self.dropout_prob = float(cfg.get("dropout_prob", 0))
        self.temp = float(cfg.get("temp", 0.1))
        self.w_uniform = float(cfg.get("w_uniform", 1))
        self.w_orth = float(cfg.get("w_orth", 10))
        self.w_clloss = float(cfg.get("w_clloss", 0.05))
        self.n_interest = int(cfg.get("K", 8))
        self.temperature = 0.1
        self.interest_embedding = self.param("interest_embedding", NORMAL_INIT,
                                             (self.n_interest, D))
        self.emb_dropout = nn.Dropout(self.dropout_prob)
        self.gru = GRU(D, self.num_layers, use_bias=False)
        self.mlp = nn.Dense(D, kernel_init=KERNEL_INIT)

    def _normed_item_table(self) -> jnp.ndarray:
        return _stopgrad_norm(self.item_emb.all_items())

    def output_items(self) -> jnp.ndarray:
        return self._normed_item_table()

    def __call__(self, batch, train: bool = True):
        item_seq = batch["hist_item_list"]
        mask = batch["hist_mask_list"]
        lengths = jnp.sum(mask, axis=-1).astype(jnp.int32)
        B, L = item_seq.shape
        interest_bank = _stopgrad_norm(self.interest_embedding)

        pos_neg_emb = None
        if train and "lookup_all" in batch:
            # one planned lookup for [hist | pos | neg]; per-row stop-grad
            # norm AFTER the gather == gather from the normed table (the
            # norm is rowwise; padding rows are zero either way)
            emb = self.item_emb(batch["lookup_all"], batch.get("emb_plan"))
            emb = _stopgrad_norm(emb)
            seq_emb, pos_neg_emb = emb[:, :L], (emb[:, L], emb[:, L + 1])
        else:
            item_table = self._normed_item_table()
            seq_emb = jnp.take(item_table, item_seq, axis=0)
        seq_emb = self.emb_dropout(seq_emb, deterministic=not train)

        psnl_interest = jnp.broadcast_to(interest_bank[None], (B, self.n_interest,
                                                               self.embedding_dim))
        # NOTE (parity, r5): the reference computes an orth + uniform
        # regularizer into a local ``interest_cl`` (cmi.py:80-96) but NEVER
        # adds it to the returned loss (cmi.py:120-124 uses only
        # calculate_cmi_loss) — dead code.  Round-4 ported the regularizer
        # as if it were live, which at w_orth=10 over-constrains the
        # interest bank and cost ~2x recall on the 64k leg
        # (seq3/CMI 0.0119 vs reference 0.0240).  Behavior replicated: the
        # regularizer is NOT applied.

        # one soft-assignment iteration (cmi.py:81-103)
        scores = jnp.einsum("bld,bkd->blk", seq_emb, psnl_interest) / self.temp
        probs = nn.softmax(scores, axis=-1) * (item_seq > 0)[..., None]
        psnl_interest = jnp.einsum("blk,bld->bkd", probs, seq_emb)
        # differentiable normalize: the reference's F.normalize here is in
        # the autodiff graph (cmi.py:97) — only the WEIGHT renorm is no_grad
        psnl_interest = safe_l2norm(psnl_interest)
        interest_mask = jnp.sum(probs, axis=1)  # [B, K]
        psnl_interest = jnp.where(interest_mask[..., None] > 0, psnl_interest,
                                  jnp.broadcast_to(interest_bank[None], psnl_interest.shape))

        # global personal embedding via GRU (cmi.py:106-110)
        gru_out, _ = self.gru(seq_emb)
        gru_out = nn.relu(self.mlp(gru_out))
        full_psnl = self.gather_indexes(gru_out, jnp.clip(lengths - 1, 0, None))
        full_psnl = safe_l2norm(full_psnl)

        psnl_interest = safe_l2norm(psnl_interest + full_psnl[:, None, :])

        out = {"user_emb": psnl_interest}
        if train:
            out["global_user_emb"] = full_psnl
            out["loss"] = self._cmi_loss(psnl_interest, batch["target_item"],
                                         pos_neg_emb)
        return out

    def _cmi_loss(self, psnl_interest, pos_items, pos_neg_emb):
        B, K, D = psnl_interest.shape
        if pos_neg_emb is not None:
            pos_emb, neg_emb = pos_neg_emb
        else:
            item_table = self._normed_item_table()
            rng = self.make_rng("dropout")
            n_item = item_table.shape[0]
            neg_items = jax.random.randint(rng, (B,), 1, max(n_item - 1, 2))
            pos_emb = jnp.take(item_table, pos_items, axis=0)   # [B, D]
            neg_emb = jnp.take(item_table, neg_items, axis=0)   # [B, D]
        pos_scores = jnp.sum(psnl_interest * pos_emb[:, None, :], axis=-1)  # [B, K]
        neg_scores = jnp.einsum("bkd,nd->bkn", psnl_interest, neg_emb)      # [B, K, B]
        scores = jnp.concatenate([pos_scores[..., None], neg_scores], axis=-1)
        scores = jnp.max(scores, axis=1)                                    # [B, 1+B]
        logprobs = nn.log_softmax(scores / self.temp, axis=-1)
        loss = -jnp.mean(logprobs[:, 0])
        if B % 2 == 0:
            loss = loss + self.w_clloss * self._multi_inter_clloss(psnl_interest)
        return loss

    def _multi_inter_clloss(self, user_interests):
        B, K, D = user_interests.shape
        pairs = user_interests.reshape(B // 2, 2, K, D)
        a = safe_l2norm(pairs[:, 0].reshape(-1, D))
        b = safe_l2norm(pairs[:, 1].reshape(-1, D))
        sim = (a @ b.T) / self.temperature
        labels = jnp.arange(sim.shape[0])
        ce_ab = -jnp.mean(jnp.take_along_axis(nn.log_softmax(sim, axis=-1),
                                              labels[:, None], axis=1))
        ce_ba = -jnp.mean(jnp.take_along_axis(nn.log_softmax(sim.T, axis=-1),
                                              labels[:, None], axis=1))
        return ce_ab + ce_ba
