"""SASRec (parity: rec_pangu/models/sequence/sasrec.py:13-70): transformer
encoder + causal additive mask + last-valid gather."""
from __future__ import annotations

import jax.numpy as jnp

from ...ops.sequence_enc import TransformerEncoder
from ..base import SequenceModelBase, register_model


@register_model("SASRec")
class SASRec(SequenceModelBase):
    fused_update_compatible = True

    def setup(self):
        self.setup_base()
        cfg = self.config
        self.self_attention = TransformerEncoder(
            n_layers=int(cfg.get("n_layers", 2)),
            n_heads=int(cfg.get("n_heads", 4)),
            inner_size=int(cfg.get("inner_size", 32)),
            hidden_dropout_prob=float(cfg.get("hidden_dropout_prob", 0.1)),
            attn_dropout_prob=float(cfg.get("attn_dropout_prob", 0.1)),
            hidden_act=cfg.get("hidden_act", "gelu"),
            layer_norm_eps=float(cfg.get("layer_norm_eps", 0.001)),
        )

    def __call__(self, batch, train: bool = True):
        mask = batch["hist_mask_list"]
        lengths = jnp.sum(mask, axis=-1).astype(jnp.int32)
        seq_emb = self.item_emb(batch["hist_item_list"], batch.get("emb_plan"))
        attn_mask = self.get_attention_mask(mask.astype(seq_emb.dtype))
        # key_valid routes the encoder through the fused Pallas kernel on
        # TPU (the attn_mask IS causal x key-padding); attn_mask stays the
        # flax fallback
        output = self.self_attention(seq_emb, attn_mask, train,
                                     key_valid=mask, causal=True)
        user_emb = self.gather_indexes(output, jnp.clip(lengths - 1, 0, None))
        out = {"user_emb": user_emb}
        if train:
            out["loss"] = self.calculate_loss(user_emb, batch["target_item"],
                                              batch.get("emb_plan"))
        return out
