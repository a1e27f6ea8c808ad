"""IOCRec (parity: rec_pangu/models/sequence/iocrec.py:15-482): local causal
transformer + global Q_s attention encoder + intention disentanglement
[B, K, L, D] + InfoNCE over two augmented views.

The reference's 4th in-repo transformer (iocrec.py:350-482) is served by the
shared ops.TransformerEncoder with a boolean causal+padding mask.
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.initializers import torch_kaiming_normal
from ...ops.sequence_enc import KERNEL_INIT, TransformerEncoder
from ..base import SequenceModelBase, register_model
from .contrarec import augment_sequences

RANDN_INIT = nn.initializers.normal(stddev=1.0)  # 1-D params only (rou)
# >=2D params are kaiming-overwritten by the reference's reset_parameters()
# (base_model.py:42-59; iocrec.py:53 calls it)
TORCH_KAIMING = torch_kaiming_normal()


def info_nce_loss(v1: jnp.ndarray, v2: jnp.ndarray, temperature: float) -> jnp.ndarray:
    """Pair-wise NCE over flattened views (iocrec.py InfoNCELoss, dot sim).

    Three separate [N, F] Gram dots on purpose: the r5 A/B of one stacked
    [2N, F] Gram measured 15.4 vs 10.3 ms fwd+bwd at the bench shape — the
    full 2Nx2N product computes the 4th (transpose-redundant) block and
    adds slice/concat HBM copies."""
    B = v1.shape[0]
    v1 = v1.reshape(B, -1)
    v2 = v2.reshape(B, -1)
    sim11 = v1 @ v1.T
    sim22 = v2 @ v2.T
    sim12 = v1 @ v2.T
    inf_diag = jnp.eye(B) * -1e9
    sim11 = sim11 + inf_diag
    sim22 = sim22 + inf_diag
    logits1 = jnp.concatenate([sim12, sim11], axis=-1)
    logits2 = jnp.concatenate([sim22, sim12.T], axis=-1)
    logits = jnp.concatenate([logits1, logits2], axis=0) / temperature
    labels = jnp.arange(2 * B)
    logp = nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


class GlobalSeqEncoder(nn.Module):
    max_len: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, item_emb: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        D = item_emb.shape[-1]
        Q_s = self.param("Q_s", TORCH_KAIMING, (self.max_len, D))
        k_lin = nn.Dense(D, kernel_init=KERNEL_INIT, name="K_linear")
        v_lin = nn.Dense(D, kernel_init=KERNEL_INIT, name="V_linear")
        if self._use_fused(item_emb.shape[0], train):
            from ...ops.kernels.embedding_grad import _interpret
            from ...ops.kernels.fused_encoder import (encoder_mesh_ok,
                                                      encoder_tb)
            from ...ops.kernels.global_attn import global_attn, global_attn_dp

            p = self.variables["params"]
            params = (p["K_linear"]["kernel"], p["K_linear"]["bias"],
                      p["V_linear"]["kernel"], p["V_linear"]["bias"], Q_s)
            if train and self.dropout > 0.0:
                seed = jax.random.randint(self.make_rng("dropout"), (),
                                          0, jnp.iinfo(jnp.int32).max)
            else:
                seed = jnp.int32(0)
            _, mesh, _ = encoder_mesh_ok(item_emb.shape[0], encoder_tb())
            if mesh is not None:
                return global_attn_dp(item_emb, params, seed, mesh,
                                      self.dropout if train else 0.0, train,
                                      encoder_tb(), _interpret())
            return global_attn(item_emb, params, seed,
                               self.dropout if train else 0.0, train,
                               encoder_tb(), _interpret())
        key = k_lin(item_emb)
        value = v_lin(item_emb)
        attn = nn.softmax(jnp.einsum("ld,bmd->blm", Q_s, key), axis=-1)
        out = jnp.einsum("blm,bmd->bld", attn, value)
        return nn.Dropout(self.dropout, deterministic=not train)(out)

    def _use_fused(self, n_rows: int, train: bool) -> bool:
        """Same gate rules as the fused transformer encoder
        (ops/sequence_enc.py _use_fused): TPU or interpret mode, no active
        mesh, tile-divisible batch; cpu without interpret can never lower."""
        import os

        flag = os.environ.get("REC_PANGU_TPU_FUSED_ENCODER", "auto")
        if flag in ("0", "off", "false"):
            return False
        if self.is_initializing():
            return False  # the flax path creates K/V params
        from ...ops.kernels.fused_encoder import encoder_mesh_ok, encoder_tb

        ok, _, per_shard = encoder_mesh_ok(n_rows, encoder_tb())
        if not ok:
            return False
        from ...ops.kernels.embedding_grad import _interpret

        backend = jax.default_backend()
        if backend == "cpu":
            if not _interpret():
                return False
            if train and self.dropout > 0:
                # pltpu.prng_seed has no interpret-mode lowering on cpu
                return False
        if backend not in ("cpu", "tpu", "axon"):
            return False
        return per_shard % encoder_tb() == 0


class DisentangleFactors(tuple):
    """Factored [B, K, L, D] intention tensor (never materialized per se).

    ``y_{bkld} = alpha^loc_{bkl} c^loc_{bld} + alpha^glob_{bkl} c^glob_{bld}
    + 2 beta_d`` — exact, because the reference's
    ``layer_norm_5(score * item_emb)`` (iocrec.py:312) normalizes a POSITIVE
    per-(b,k,l) scalar multiple of the k-independent encoder row:
    ``LN(s·e) = s/sqrt(s^2 var(e) + eps) · (e - mean(e)) ⊙ gamma + beta``,
    so the K axis only enters through the scalars ``alpha``.  The
    elementwise-equal dense tensor is built on demand (``dense()``); the
    user-embedding gather and the K-max CE consume the factors directly,
    which removes ~3 HBM materializations of the 157 MB [3B, K, L, D]
    activations (and layer-norm backward over them) from the train step."""

    __slots__ = ()

    def __new__(cls, alpha_l, c_l, alpha_g, c_g, beta):
        return tuple.__new__(cls, (alpha_l, c_l, alpha_g, c_g, beta))

    alpha_l = property(lambda s: s[0])  # [B, K, L]
    c_l = property(lambda s: s[1])      # [B, L, D]
    alpha_g = property(lambda s: s[2])
    c_g = property(lambda s: s[3])
    beta = property(lambda s: s[4])     # [D]

    def dense(self) -> jnp.ndarray:
        """Materialize [B, K, L, D] (eval/tests/CL-loss rows)."""
        y = jnp.einsum("bkl,bld->bkld", self.alpha_l, self.c_l)
        y = y + jnp.einsum("bkl,bld->bkld", self.alpha_g, self.c_g)
        return y + 2.0 * self.beta

    def slice_rows(self, a: int, b: int) -> "DisentangleFactors":
        return DisentangleFactors(self.alpha_l[a:b], self.c_l[a:b],
                                  self.alpha_g[a:b], self.c_g[a:b], self.beta)

    def gather_user_emb(self, idx: jnp.ndarray) -> jnp.ndarray:
        """y at position ``idx`` per row -> [B, K, D] (the reference's
        gather_indexes over the dense tensor, iocrec.py:74)."""
        al = jnp.take_along_axis(self.alpha_l, idx[:, None, None], axis=2)[..., 0]
        ag = jnp.take_along_axis(self.alpha_g, idx[:, None, None], axis=2)[..., 0]
        wl = jnp.take_along_axis(
            self.c_l, idx[:, None, None].repeat(self.c_l.shape[-1], 2), axis=1)[:, 0]
        wg = jnp.take_along_axis(
            self.c_g, idx[:, None, None].repeat(self.c_g.shape[-1], 2), axis=1)[:, 0]
        return (al[..., None] * wl[:, None, :] + ag[..., None] * wg[:, None, :]
                + 2.0 * self.beta)


jax.tree_util.register_pytree_node(
    DisentangleFactors,
    lambda f: (tuple(f), None),
    lambda _, leaves: DisentangleFactors(*leaves))


class _LNParams(nn.Module):
    """nn.LayerNorm's param tree (scale, bias) without the normalization —
    the owning module applies them in factored form."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class DisentangleEncoder(nn.Module):
    k_intention: int
    max_len: int
    # torch nn.LayerNorm default — the reference builds these five norms
    # WITHOUT an eps override (iocrec.py:236-240), unlike its transformer
    ln_eps: float = 1e-5

    @nn.compact
    def __call__(self, local_emb, global_emb, seq_len, factored: bool = False):
        D = local_emb.shape[-1]
        intentions = self.param("intentions", TORCH_KAIMING, (self.k_intention, D))
        pos_fai = self.param("pos_fai", TORCH_KAIMING, (self.max_len, D))
        rou = self.param("rou", RANDN_INIT, (D,))
        W = nn.Dense(D, kernel_init=KERNEL_INIT, name="W")
        ln1 = nn.LayerNorm(self.ln_eps, name="layer_norm_1")
        ln2 = nn.LayerNorm(self.ln_eps, name="layer_norm_2")
        ln3 = nn.LayerNorm(self.ln_eps, name="layer_norm_3")
        ln4 = nn.LayerNorm(self.ln_eps, name="layer_norm_4")
        # layer_norm_5's params, applied in factored form (see
        # DisentangleFactors); declared under the same module path/param
        # names nn.LayerNorm would use, so checkpoints and transplants are
        # unaffected
        ln5_scale, ln5_bias = _LNParams(D, name="layer_norm_5")()

        def factors(item_emb):
            B, L, _ = item_emb.shape
            # item -> intention score (iocrec.py item2IntentionScore)
            logits = jnp.einsum("bld,kd->blk", ln1(item_emb), ln2(intentions))
            i2i_score = nn.softmax(logits / math.sqrt(D), axis=-1)

            # item -> attention weight (item2AttnWeight)
            idx = jnp.clip(seq_len - 1, 0, L - 1)
            q_row = jnp.take_along_axis(item_emb, idx[:, None, None].repeat(D, axis=2),
                                        axis=1)[:, 0]
            q_row = q_row + jnp.take(pos_fai, idx, axis=0) + rou
            item_query = ln3(q_row)[:, None, :]
            key_hat = ln4(item_emb + pos_fai[None, :L])
            item_key = key_hat + nn.relu(W(key_hat))
            attn_logits = jnp.einsum("bld,bmd->blm", item_query,
                                     item_key)[:, 0] / math.sqrt(D)
            attn = nn.softmax(attn_logits, axis=-1)  # [B, L]

            s = (i2i_score * attn[..., None]).transpose(0, 2, 1)  # [B, K, L]
            mu = jnp.mean(item_emb, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(item_emb - mu), axis=-1)  # [B, L]
            alpha = s * jax.lax.rsqrt(
                jnp.square(s) * var[:, None, :] + self.ln_eps)  # [B, K, L]
            c_hat = (item_emb - mu) * ln5_scale  # [B, L, D]
            return alpha, c_hat

        al, cl = factors(local_emb)
        ag, cg = factors(global_emb)
        out = DisentangleFactors(al, cl, ag, cg, ln5_bias)
        return out if factored else out.dense()


@register_model("IOCRec")
class IOCRec(SequenceModelBase):
    # With HOST-side augmentations (trainer attaches batch["aug_all"] =
    # [hist; aug1; aug2] plus an embedding sort plan over it), the only
    # item-table uses are the planned [3B, L] lookup and the K-max CE — both
    # captured by the fused-update step (train/fused_update.py).
    fused_update_compatible = True
    host_aug = True
    fused_lookup_key = "aug_all"

    def setup(self):
        self.setup_base()
        cfg = self.config
        D = self.embedding_dim
        self.tao = float(cfg.get("tao", 2))
        # same config keys the trainer's host-augmentation path reads
        # (train/trainer.py _attach) so host and device augmentation draw
        # from the same crop-ratio distribution
        self.beta_a = float(cfg.get("beta_a", 3.0))
        self.beta_b = float(cfg.get("beta_b", 3.0))
        self.all_hidden = bool(cfg.get("all_hidden", True))
        self.lamda = float(cfg.get("lamda", 0.1))
        self.k_intention = int(cfg.get("K", 4))
        eps = float(cfg.get("layer_norm_eps", 1e-12))
        self.hidden_dropout = float(cfg.get("hidden_dropout", 0.5))
        self.position_embedding = self.param("position_embedding", KERNEL_INIT,
                                             (self.max_length, D))
        self.input_layer_norm = nn.LayerNorm(epsilon=eps)
        self.input_dropout = nn.Dropout(self.hidden_dropout)
        self.local_encoder = TransformerEncoder(
            n_layers=int(cfg.get("num_blocks", 3)),
            n_heads=int(cfg.get("num_heads", 2)),
            inner_size=int(cfg.get("ffn_hidden", 128)),
            hidden_dropout_prob=self.hidden_dropout,
            attn_dropout_prob=float(cfg.get("attn_dropout", 0.5)),
            hidden_act="relu",
            layer_norm_eps=eps,
        )
        self.global_seq_encoder = GlobalSeqEncoder(self.max_length, self.hidden_dropout)
        self.disentangle_encoder = DisentangleEncoder(self.k_intention, self.max_length)
        item_col = self.config.get("item_col", "item_id")
        self.mask_token = int(self.enc_dict[item_col]["vocab_size"]) - 1

    def _causal_mask(self, item_seq):
        keep = (item_seq != 0)[:, None, None, :]  # [B,1,1,L]
        L = item_seq.shape[1]
        keep = jnp.broadcast_to(keep, (item_seq.shape[0], 1, L, L))
        return jnp.tril(keep)

    def _use_fused_encoder(self, n_rows: int, train: bool) -> bool:
        """Route the local transformer through the fused Pallas encoder
        (ops/kernels/fused_encoder.py) — the XLA stack round-trips every
        sub-op's [3B, L, D] activations through HBM (~26 ms fwd+bwd at the
        bench shape vs ~1 ms of MXU work).  auto = TPU (or interpret) and a
        tile-divisible batch; REC_PANGU_TPU_FUSED_ENCODER=0 forces off."""
        import os

        flag = os.environ.get("REC_PANGU_TPU_FUSED_ENCODER", "auto")
        if flag in ("0", "off", "false"):
            return False
        if self.is_initializing():
            return False  # flax path creates the encoder params
        from ...ops.kernels.fused_encoder import encoder_mesh_ok, encoder_tb

        ok, _, per_shard = encoder_mesh_ok(n_rows, encoder_tb())
        if not ok:
            return False
        from ...ops.kernels.embedding_grad import _interpret

        backend = jax.default_backend()
        if backend == "cpu":
            if not _interpret():
                # even an explicit =1 cannot lower a TPU kernel on cpu
                # without REC_PANGU_TPU_PALLAS_INTERPRET (multimax-gate rule)
                return False
            if train and (self.hidden_dropout > 0
                          or float(self.config.get("attn_dropout", 0.5)) > 0):
                # pltpu.prng_seed has no interpret-mode lowering on cpu —
                # dropout-bearing training stays on the flax path there
                return False
        if backend not in ("cpu", "tpu", "axon"):
            return False
        D = self.embedding_dim
        n_heads = int(self.config.get("num_heads", 2))
        return per_shard % encoder_tb() == 0 and D % n_heads == 0

    def _local_from_emb(self, emb, item_seq, train):
        L = item_seq.shape[1]
        seq_emb = emb + self.position_embedding[None, :L]
        seq_emb = self.input_layer_norm(seq_emb)
        seq_emb = self.input_dropout(seq_emb, deterministic=not train)
        if self._use_fused_encoder(item_seq.shape[0], train):
            from ...ops.kernels.embedding_grad import _interpret
            from ...ops.kernels.fused_encoder import (encoder_mesh_ok,
                                                      encoder_tb,
                                                      fused_encoder,
                                                      fused_encoder_dp,
                                                      pack_params)

            cfg = self.config
            n_layers = int(cfg.get("num_blocks", 3))
            packed = pack_params(
                self.local_encoder.variables["params"], n_layers)
            if train:
                seed = jax.random.randint(self.make_rng("dropout"), (),
                                          0, jnp.iinfo(jnp.int32).max)
            else:
                seed = jnp.int32(0)
            args = (n_layers, int(cfg.get("num_heads", 2)),
                    int(cfg.get("ffn_hidden", 128)),
                    self.hidden_dropout if train else 0.0,
                    float(cfg.get("attn_dropout", 0.5)) if train else 0.0,
                    float(cfg.get("layer_norm_eps", 1e-12)), train,
                    encoder_tb(), _interpret())
            _, mesh, _ = encoder_mesh_ok(item_seq.shape[0], encoder_tb())
            if mesh is not None:
                return fused_encoder_dp(seq_emb, packed, (item_seq != 0),
                                        seed, mesh, *args)
            return fused_encoder(seq_emb, packed, (item_seq != 0), seed,
                                 *args)
        return self.local_encoder(seq_emb, self._causal_mask(item_seq), train)

    def _local_encoding(self, item_seq, train):
        return self._local_from_emb(
            self.item_emb(item_seq, prefer_kernel_grad=True), item_seq, train)

    def _intention_emb(self, item_seq, seq_len, train, plan=None):
        """Dense [B, K, L, D] intention tensor (eval/tests)."""
        return self._intention_factors(item_seq, seq_len, train, plan).dense()

    def _intention_factors(self, item_seq, seq_len, train, plan=None):
        # ONE table gather serves both encoders (the reference looks the
        # sequence up once per encoder, iocrec.py:216,350+; the lookup's
        # sorted-segment backward is ~10.7 ms at the bench shape, so sharing
        # it halves that cost).  ``plan`` is the host sort plan over these
        # ids (host-augmented batches); without it, device-generated ids
        # fall back to the sorted-segment kernel.
        emb = self.item_emb(item_seq, plan, prefer_kernel_grad=plan is None)
        local_emb = self._local_from_emb(emb, item_seq, train)
        global_emb = self.global_seq_encoder(emb, train)
        return self.disentangle_encoder(local_emb, global_emb, seq_len,
                                        factored=True)

    def __call__(self, batch, train: bool = True):
        item_seq = batch["hist_item_list"]
        seq_len = jnp.sum(batch["hist_mask_list"], axis=-1).astype(jnp.int32)
        B, L = item_seq.shape
        D = self.embedding_dim
        if train:
            # ONE [3B] encoder pass serves the main view + both augmented
            # views (the reference runs three full encoder stacks per step,
            # iocrec.py:79-104; batching them triples MXU occupancy at these
            # small per-view shapes and drops two dispatches).  Every op in
            # _intention_emb is batch-parallel, so rows are identical to
            # three separate passes (pinned by test_iocrec_batch_concat).
            plan = None
            if "aug_all" in batch:
                # host-augmented views: ids are host-visible, the sort plan
                # covers the [3B, L] lookup, and the fused update applies
                all_seq = batch["aug_all"]
                plan = batch.get("emb_plan")
            else:
                rng = self.make_rng("dropout")
                r1, r2 = jax.random.split(rng)
                aug1 = augment_sequences(r1, item_seq, self.beta_a,
                                         self.beta_b, self.mask_token)
                aug2 = augment_sequences(r2, item_seq, self.beta_a,
                                         self.beta_b, self.mask_token)
                all_seq = jnp.concatenate([item_seq, aug1, aug2], axis=0)
            all_len = jnp.concatenate([seq_len, seq_len, seq_len], axis=0)
            factors3 = self._intention_factors(all_seq, all_len, train, plan)
            factors = factors3.slice_rows(0, B)
        else:
            factors = self._intention_factors(item_seq, seq_len, train)
        idx = jnp.clip(seq_len - 1, 0, L - 1)
        user_emb = factors.gather_user_emb(idx)  # [B, K, D]
        out = {"user_emb": user_emb}
        if train:
            item = batch["target_item"]
            if self.config.get("loss_type", "full") == "sampled":
                # scale knob past the exact K-max CE (VERDICT r4 item 7);
                # seq_fused_applicable gates the capture path off for it
                rec_loss = self.calculate_multimax_sampled_loss(
                    user_emb, item,
                    int(self.config.get("num_negatives", 1024)))
                out["loss"] = rec_loss + self.lamda * self._cl_loss(factors3, B)
                return out
            candidates = self.output_items()
            import os

            from ...ops.softmax_ce import (_FUSED_MIN_VOCAB,
                                           fused_multimax_softmax_ce,
                                           fused_multimax_softmax_ce_captured)

            plan = batch.get("emb_plan")
            cap = plan.get("capture") if isinstance(plan, dict) else None
            if cap is not None and "ce_t" in cap:
                # fused-update mode: the CE's table gradient routes to the
                # zero capture leaf; the table itself is out of autodiff
                out["loss"] = (fused_multimax_softmax_ce_captured(
                    user_emb, jax.lax.stop_gradient(candidates), item,
                    cap["ce_t"], self.item_emb.table.shape[0])
                    + self.lamda * self._cl_loss(factors3, B))
                return out
            flag = os.environ.get("REC_PANGU_TPU_FUSED_CE", "auto")
            use_fused = (flag == "1") or (
                flag not in ("0", "off", "false")
                and candidates.shape[0] >= _FUSED_MIN_VOCAB)
            if use_fused:
                # streamed: the naive form materializes [B, K, V] logits
                # (16 GB at B=1024, K=4, V=1M -> OOM)
                rec_loss = fused_multimax_softmax_ce(user_emb, candidates,
                                                     item)
            else:
                logits = jnp.einsum("bkd,nd->bkn", user_emb, candidates)
                max_logits = jnp.max(logits, axis=1)
                logp = nn.log_softmax(max_logits, axis=-1)
                rec_loss = -jnp.mean(
                    jnp.take_along_axis(logp, item[:, None], axis=1))

            out["loss"] = rec_loss + self.lamda * self._cl_loss(factors3, B)
        return out

    def _cl_loss(self, factors3, B):
        # the CL views are the only consumers that need the dense tensor;
        # materialize just the [2B, K, L, D] augmented rows
        aug = factors3.slice_rows(B, 3 * B).dense()
        d1 = aug[:B].reshape(B * self.k_intention, -1)
        d2 = aug[B:].reshape(B * self.k_intention, -1)
        return info_nce_loss(d1, d2, self.tao)
