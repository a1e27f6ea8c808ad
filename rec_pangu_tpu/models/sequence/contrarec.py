"""ContraRec (parity: rec_pangu/models/sequence/contrarec.py:15-178):
BERT4Rec/GRU4Rec/Caser encoder + in-model sequence augmentation (mask or
reorder per sample) + supervised contrastive ContraLoss.

Augmentation is vectorized with jax.random instead of the reference's
per-sample Python loops (contrarec.py:145-176): mask-op selects ~ratio*L
positions by Bernoulli(ratio) (the reference picks exactly int(ratio*L) via
randperm — same distribution in expectation), reorder-op shuffles a random
contiguous window via keyed argsort.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.sequence_enc import BERT4RecEncoder, CaserEncoder, GRU4RecEncoder
from ...ops.numerics import safe_l2norm
from ..base import SequenceModelBase, register_model
from .contra_losses import contrarec_contra_loss



def _fast_beta(rng: jax.Array, a: float, b: float, shape) -> jnp.ndarray:
    """Beta(a, b) sampler without the rejection loop.

    ``jax.random.beta`` lowers to a vmapped gamma rejection WHILE loop —
    113 ms for 2048 draws on v5e, dominating the whole ContraRec/IOCRec
    train step.  For integer shape parameters (the models use Beta(3, 3)),
    Gamma(k) is exactly the sum of k Exp(1) = -log(prod of k uniforms), so
    Beta(a, b) = Ga / (Ga + Gb) — a handful of fused VPU ops."""
    ia, ib = int(round(a)), int(round(b))
    if abs(a - ia) > 1e-6 or abs(b - ib) > 1e-6 or ia < 1 or ib < 1:
        return jax.random.beta(rng, a, b, shape)
    u = jax.random.uniform(rng, tuple(shape) + (ia + ib,),
                           minval=1e-7, maxval=1.0)
    logs = jnp.log(u)
    ga = -jnp.sum(logs[..., :ia], axis=-1)
    gb = -jnp.sum(logs[..., ia:], axis=-1)
    return ga / (ga + gb)


def host_augment_sequences(rng, item_seq, beta_a: float, beta_b: float,
                           mask_token: int):
    """NumPy twin of :func:`augment_sequences` — same per-sample 50%
    mask-op / 50% reorder-op distribution, drawn from a host ``rng``
    (np.random.Generator).  Running the augmentation on host makes the
    augmented ids host-visible, so the trainer can build an embedding sort
    plan over the [3B, L] lookup and the fused table-Adam path applies
    (contrastive models were otherwise stuck with device-generated ids)."""
    import numpy as np

    hist = np.asarray(item_seq)
    B, L = hist.shape
    ratio = rng.beta(beta_a, beta_b, (B, 1))
    masked = np.where(rng.random((B, L)) < ratio, mask_token, hist)
    w = (ratio[:, 0] * L).astype(np.int32)
    start = (rng.random(B) * (L - w + 1)).astype(np.int32)
    pos = np.broadcast_to(np.arange(L)[None, :], (B, L))
    in_window = (pos >= start[:, None]) & (pos < (start + w)[:, None])
    noise = rng.uniform(-0.4, 0.4, (B, L))
    keys = np.where(in_window, pos + noise * w[:, None],
                    pos.astype(np.float64))
    perm = np.argsort(keys, axis=1)
    reordered = np.take_along_axis(hist, perm, axis=1)
    choose_mask = rng.random((B, 1)) > 0.5
    return np.where(choose_mask, masked, reordered).astype(hist.dtype)


def augment_sequences(rng: jax.Array, item_seq: jnp.ndarray, beta_a: float,
                      beta_b: float, mask_token: int) -> jnp.ndarray:
    """Per-sample: 50% mask-op, 50% reorder-op (contrarec.py:169-176)."""
    B, L = item_seq.shape
    r_choice, r_ratio, r_mask, r_start, r_keys = jax.random.split(rng, 5)
    ratio = _fast_beta(r_ratio, beta_a, beta_b, (B, 1))

    # mask-op: replace ~ratio*L random positions with the mask token
    mask_positions = jax.random.uniform(r_mask, (B, L)) < ratio
    masked = jnp.where(mask_positions, mask_token, item_seq)

    # reorder-op: permute a random contiguous window of length ratio*L
    w = (ratio[:, 0] * L).astype(jnp.int32)
    start = (jax.random.uniform(r_start, (B,)) * (L - w + 1)).astype(jnp.int32)
    pos = jnp.arange(L)[None, :].repeat(B, axis=0)
    in_window = (pos >= start[:, None]) & (pos < (start + w)[:, None])
    noise = jax.random.uniform(r_keys, (B, L), minval=-0.4, maxval=0.4)
    keys = jnp.where(in_window, pos + noise * w[:, None], pos.astype(jnp.float32))
    perm = jnp.argsort(keys, axis=1)
    reordered = jnp.take_along_axis(item_seq, perm, axis=1)

    choose_mask = jax.random.uniform(r_choice, (B, 1)) > 0.5
    return jnp.where(choose_mask, masked, reordered)


@register_model("ContraRec")
class ContraRec(SequenceModelBase):
    # With host-side augmentations (batch["aug_all"] = [hist; aug1; aug2]
    # + a sort plan over it) the only table uses are the planned [3B, L]
    # lookup and the full-softmax CE — fused-update eligible (the contra
    # loss consumes activations and target ids only).
    fused_update_compatible = True
    host_aug = True
    fused_lookup_key = "aug_all"

    def setup(self):
        self.setup_base()
        cfg = self.config
        self.gamma = float(cfg.get("gamma", 1))
        self.beta_a = float(cfg.get("beta_a", 3))
        self.beta_b = float(cfg.get("beta_b", 3))
        self.ccc_temp = float(cfg.get("ccc_temp", 0.2))
        self.encoder_name = cfg.get("encoder_name", "BERT4Rec")
        if self.encoder_name == "GRU4Rec":
            self.encoder = GRU4RecEncoder(hidden_size=128)
        elif self.encoder_name == "Caser":
            self.encoder = CaserEncoder(self.max_length, num_horizon=16,
                                        num_vertical=8, l=5)
        elif self.encoder_name == "BERT4Rec":
            self.encoder = BERT4RecEncoder(self.max_length, num_layers=2, num_heads=2)
        else:
            raise ValueError("Invalid sequence encoder.")
        item_col = self.config.get("item_col", "item_id")
        self.mask_token = int(self.enc_dict[item_col]["vocab_size"]) - 1

    def _encode(self, seq_emb, lengths, train):
        if self.encoder_name == "BERT4Rec":
            return self.encoder(seq_emb, lengths, train)
        return self.encoder(seq_emb, lengths)

    def __call__(self, batch, train: bool = True):
        item_seq = batch["hist_item_list"]
        lengths = jnp.sum(batch["hist_mask_list"], axis=1).astype(jnp.int32)
        B = item_seq.shape[0]
        if train and "aug_all" in batch:
            # host-augmented views: ONE planned [3B, L] lookup + ONE [3B]
            # encoder pass serve the main view and both augmentations; the
            # sort plan covers the lookup so the fused update applies
            plan = batch.get("emb_plan")
            all_seq = batch["aug_all"]
            all_len = jnp.concatenate([lengths, lengths, lengths], axis=0)
            enc3 = self._encode(self.item_emb(all_seq, plan), all_len, train)
            user_emb = enc3[:B]
            emb12 = enc3[B:]
            out = {"user_emb": user_emb}
            item = batch["target_item"]
            features = safe_l2norm(
                jnp.stack([emb12[:B], emb12[B:]], axis=1))
            out["loss"] = self.calculate_loss(user_emb, item, plan) + \
                self.gamma * contrarec_contra_loss(features, item,
                                                   self.ccc_temp)
            return out
        seq_emb = self.item_emb(item_seq, batch.get("emb_plan"))
        user_emb = self._encode(seq_emb, lengths, train)
        out = {"user_emb": user_emb}
        if train:
            item = batch["target_item"]
            rng = self.make_rng("dropout")
            r1, r2 = jax.random.split(rng)
            aug1 = augment_sequences(r1, item_seq, self.beta_a, self.beta_b,
                                     self.mask_token)
            aug2 = augment_sequences(r2, item_seq, self.beta_a, self.beta_b,
                                     self.mask_token)
            # ONE [2B] encoder pass for both augmented views (the reference
            # encodes each view separately, contrarec.py:104-111); every
            # encoder op is batch-parallel, so rows match two separate
            # passes.  Device-generated ids: no host plan exists; the
            # sorted-segment kernel backs their gradients (FAST_SCATTER auto)
            both = jnp.concatenate([aug1, aug2], axis=0)
            emb12 = self._encode(
                self.item_emb(both, prefer_kernel_grad=True),
                jnp.concatenate([lengths, lengths], axis=0), train)
            features = safe_l2norm(
                jnp.stack([emb12[:B], emb12[B:]], axis=1))
            out["loss"] = self.calculate_loss(user_emb, item) + \
                self.gamma * contrarec_contra_loss(features, item, self.ccc_temp)
        return out
