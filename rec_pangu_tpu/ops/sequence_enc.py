"""Sequence encoders.

One transformer implementation serves all three of the reference's copies
(rec_pangu/models/layers/trainformer.py:13-259 for SASRec/GCSAN,
layers/sequence.py:150-228 for BERT4Rec-style encoders,
sequence/iocrec.py:350-482) — consolidated per SURVEY.md §5.

* TransformerBlock / TransformerEncoder: post-LN, additive attention mask,
  configurable FFN activation and dropouts (trainformer semantics).
* BERT4RecEncoder <- layers/sequence.py:286-312 (learned positions,
  bidirectional padding mask, last-valid gather).
* GRU <- torch nn.GRU (unpacked; padded steps ARE processed, as NARM does).
* GRU4RecEncoder <- layers/sequence.py:231-251 (packed GRU == mask-gated GRU
  whose carry freezes at padding; final hidden -> Dense out).
* STAMPLayer <- layers/sequence.py:89-144.
* CaserEncoder <- layers/sequence.py:254-283.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .activations import get_activation

KERNEL_INIT = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


# --------------------------------------------------------------------------- #
# transformer
# --------------------------------------------------------------------------- #
class TransformerBlock(nn.Module):
    n_heads: int = 2
    inner_size: int = 256
    hidden_dropout: float = 0.5
    attn_dropout: float = 0.5
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-12

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_mask: Optional[jnp.ndarray] = None,
                 train: bool = True) -> jnp.ndarray:
        B, L, H = x.shape
        dh = H // self.n_heads

        def proj(name):
            return nn.Dense(H, kernel_init=KERNEL_INIT, name=name)

        # head split stays folded into the einsums (no explicit [B,H,L,dh]
        # transpose copies — XLA fuses the reshape-transpose into the matmul)
        q = proj("query")(x).reshape(B, L, self.n_heads, dh)
        k = proj("key")(x).reshape(B, L, self.n_heads, dh)
        v = proj("value")(x).reshape(B, L, self.n_heads, dh)
        scores = jnp.einsum("blhd,bmhd->bhlm", q, k) / jnp.sqrt(dh).astype(x.dtype)
        if attn_mask is not None:
            if attn_mask.dtype == jnp.bool_:
                attn_mask = jnp.where(attn_mask, 0.0, -1e6)
            scores = scores + attn_mask
        probs = nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.attn_dropout, deterministic=not train)(probs)
        ctx = jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(B, L, H)
        ctx = nn.Dense(H, kernel_init=KERNEL_INIT, name="dense")(ctx)
        ctx = nn.Dropout(self.hidden_dropout, deterministic=not train)(ctx)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps)(ctx + x)

        h = nn.Dense(self.inner_size, kernel_init=KERNEL_INIT, name="ffn_1")(x)
        h = get_activation(self.hidden_act)(h)
        h = nn.Dense(H, kernel_init=KERNEL_INIT, name="ffn_2")(h)
        h = nn.Dropout(self.hidden_dropout, deterministic=not train)(h)
        return nn.LayerNorm(epsilon=self.layer_norm_eps)(h + x)


class TransformerEncoder(nn.Module):
    n_layers: int = 2
    n_heads: int = 2
    inner_size: int = 256
    hidden_dropout_prob: float = 0.5
    attn_dropout_prob: float = 0.5
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-12

    @nn.compact
    def __call__(self, x, attn_mask=None, train: bool = True,
                 key_valid=None, causal: bool = True):
        """``key_valid`` ([B, L] {0,1}) opts into the fused Pallas encoder
        (ops/kernels/fused_encoder.py) on TPU: callers whose ``attn_mask``
        is exactly causal-x-key-padding (SASRec/GCSAN semantics) pass the
        padding mask here; ``attn_mask`` remains the flax fallback."""
        if key_valid is not None and self._use_fused(x, train):
            from .kernels.embedding_grad import _interpret
            from .kernels.fused_encoder import (encoder_mesh_ok, encoder_tb,
                                                fused_encoder,
                                                fused_encoder_dp, pack_params)

            packed = pack_params(self.variables["params"], self.n_layers)
            if train and (self.hidden_dropout_prob > 0
                          or self.attn_dropout_prob > 0):
                seed = jax.random.randint(self.make_rng("dropout"), (),
                                          0, jnp.iinfo(jnp.int32).max)
                hdrop, adrop = self.hidden_dropout_prob, self.attn_dropout_prob
            else:
                seed = jnp.int32(0)
                hdrop = adrop = 0.0
            _, mesh, _ = encoder_mesh_ok(x.shape[0])
            if mesh is not None:
                # data-parallel mesh: run the kernel per-shard in shard_map
                return fused_encoder_dp(
                    x, packed, key_valid, seed, mesh, self.n_layers,
                    self.n_heads, self.inner_size, hdrop, adrop,
                    self.layer_norm_eps, train, encoder_tb(), _interpret(),
                    causal, self.hidden_act)
            return fused_encoder(x, packed, key_valid, seed, self.n_layers,
                                 self.n_heads, self.inner_size, hdrop, adrop,
                                 self.layer_norm_eps, train, encoder_tb(),
                                 _interpret(), causal, self.hidden_act)
        for _ in range(self.n_layers):
            x = TransformerBlock(self.n_heads, self.inner_size,
                                 self.hidden_dropout_prob, self.attn_dropout_prob,
                                 self.hidden_act, self.layer_norm_eps)(x, attn_mask, train)
        return x

    def _use_fused(self, x, train: bool) -> bool:
        import os

        flag = os.environ.get("REC_PANGU_TPU_FUSED_ENCODER", "auto")
        if flag in ("0", "off", "false"):
            return False
        if self.is_initializing():
            return False  # the flax path creates the block params
        if self.hidden_act not in ("relu", "gelu", "swish", "silu"):
            return False
        from .kernels.fused_encoder import encoder_mesh_ok, encoder_tb

        ok, _, per_shard = encoder_mesh_ok(x.shape[0], encoder_tb())
        if not ok:
            # mesh shapes the kernel cannot ride: row-sharded tables
            # ('model' axis) or a batch that doesn't split over 'data'
            return False
        from .kernels.embedding_grad import _interpret

        backend = jax.default_backend()
        if backend == "cpu":
            if not _interpret():
                # a TPU kernel only runs on cpu under interpret mode — even
                # an explicit =1 without REC_PANGU_TPU_PALLAS_INTERPRET
                # cannot lower (same rule as _use_multimax_kernel)
                return False
            if train and (self.hidden_dropout_prob > 0
                          or self.attn_dropout_prob > 0):
                # pltpu.prng_seed has no interpret-mode lowering on cpu —
                # dropout-bearing training stays on the flax path there
                return False
        if backend not in ("cpu", "tpu", "axon"):
            return False
        return (per_shard % encoder_tb() == 0
                and x.shape[-1] % self.n_heads == 0)


class BERT4RecEncoder(nn.Module):
    max_his: int
    num_layers: int = 2
    num_heads: int = 2

    @nn.compact
    def __call__(self, seq: jnp.ndarray, lengths: jnp.ndarray,
                 train: bool = True) -> jnp.ndarray:
        B, L, H = seq.shape
        len_range = jnp.arange(L)
        valid = len_range[None, :] < lengths[:, None]  # [B, L] bool
        from .initializers import torch_kaiming_normal

        # table init: torch kaiming fan_in = H (not rows) — see ops/embedding.py
        p_table = nn.Embed(self.max_his + 1, H,
                           embedding_init=torch_kaiming_normal(),
                           name="p_embeddings").embedding
        # The position ids are STRUCTURED (row l at position l when valid,
        # row 0 at padding), so the lookup is a static slice + masked select
        # — the nn.Embed gather's BACKWARD was a row-serial scatter of B*L
        # rows into this tiny table (~8 ms at [3072, 50] on v5e, the single
        # largest piece of the BERT4Rec-encoder wrapper; r5 ContraRec
        # profile).  Dense select backward is a batch reduction instead.
        p_emb = jnp.where(valid[:, :, None], p_table[None, :L],
                          p_table[0][None, None])
        x = seq + p_emb
        # layer_norm_eps 1e-5: the reference's BERT4Rec TransformerLayer uses
        # torch-default LayerNorms (layers/sequence.py:213,219)
        enc = TransformerEncoder(self.num_layers, self.num_heads, inner_size=H,
                                 hidden_dropout_prob=0.0, attn_dropout_prob=0.0,
                                 hidden_act="relu", layer_norm_eps=1e-5)
        if self._use_fused(B, H):
            from .kernels.embedding_grad import _interpret
            from .kernels.fused_encoder import (encoder_mesh_ok, encoder_tb,
                                                fused_encoder,
                                                fused_encoder_dp, pack_params)

            # params exist from the flax path taken at init time (the
            # _use_fused gate keeps init there); read them by module name
            packed = pack_params(
                self.variables["params"]["TransformerEncoder_0"],
                self.num_layers)
            _, mesh, _ = encoder_mesh_ok(B)
            if mesh is not None:
                x = fused_encoder_dp(x, packed, valid, jnp.int32(0), mesh,
                                     self.num_layers, self.num_heads, H,
                                     0.0, 0.0, 1e-5, False, encoder_tb(),
                                     _interpret(), False)
            else:
                x = fused_encoder(x, packed, valid, jnp.int32(0),
                                  self.num_layers, self.num_heads, H, 0.0,
                                  0.0, 1e-5, False, encoder_tb(),
                                  _interpret(), False)
        else:
            attn_mask = valid[:, None, None, :]  # bidirectional padding mask
            x = enc(x, attn_mask, train)
        x = x * valid[:, :, None]
        idx = jnp.clip(lengths - 1, 0, L - 1)
        return jnp.take_along_axis(x, idx[:, None, None].repeat(H, axis=2), axis=1)[:, 0]

    def _use_fused(self, n_rows: int, H: int) -> bool:
        """Fused Pallas encoder gate (this encoder has NO dropout, so the
        kernel always runs deterministic — same numerics as the flax path
        within matmul tolerance)."""
        import os

        flag = os.environ.get("REC_PANGU_TPU_FUSED_ENCODER", "auto")
        if flag in ("0", "off", "false"):
            return False
        if self.is_initializing():
            return False
        import jax as _jax

        from .kernels.fused_encoder import encoder_mesh_ok, encoder_tb

        ok, _, per_shard = encoder_mesh_ok(n_rows, encoder_tb())
        if not ok:
            return False
        from .kernels.embedding_grad import _interpret

        backend = _jax.default_backend()
        if backend == "cpu" and not _interpret():
            return False  # no TPU lowering on cpu without interpret mode
        if backend not in ("cpu", "tpu", "axon"):
            return False
        return per_shard % encoder_tb() == 0 and H % self.num_heads == 0


# --------------------------------------------------------------------------- #
# recurrent
# --------------------------------------------------------------------------- #
class GRU(nn.Module):
    """Multi-layer GRU over [B, L, D] -> (outputs [B, L, H], last_hidden [B, H]).

    ``mask=None`` matches torch nn.GRU on padded input (padding steps are
    processed); with a [B, L] mask the carry freezes at padded steps, matching
    packed-sequence semantics.
    """

    hidden_size: int
    num_layers: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        seq_lengths = None
        if mask is not None:
            seq_lengths = jnp.sum(mask > 0, axis=1).astype(jnp.int32)
        last_hidden = None
        for layer in range(self.num_layers):
            cell = nn.GRUCell(features=self.hidden_size, kernel_init=KERNEL_INIT,
                              name=f"gru_l{layer}")
            rnn = nn.RNN(cell, return_carry=True, name=f"rnn_l{layer}")
            # seq_lengths gives packed-sequence semantics: carry freezes past
            # the last valid step, outputs at padding are zeroed
            last_hidden, x = rnn(x, seq_lengths=seq_lengths)
        return x, last_hidden


class GRU4RecEncoder(nn.Module):
    hidden_size: int = 128
    num_layers: int = 2

    @nn.compact
    def __call__(self, seq: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        emb_size = seq.shape[-1]
        L = seq.shape[1]
        mask = (jnp.arange(L)[None, :] < lengths[:, None]).astype(seq.dtype)
        _, last = GRU(self.hidden_size, self.num_layers)(seq, mask)
        return nn.Dense(emb_size, use_bias=False, kernel_init=KERNEL_INIT,
                        name="out")(last)


# --------------------------------------------------------------------------- #
# STAMP
# --------------------------------------------------------------------------- #
class STAMPLayer(nn.Module):
    embedding_dim: int
    feat_drop: float = 0.0

    @nn.compact
    def __call__(self, emb_seqs: jnp.ndarray, lens: jnp.ndarray,
                 train: bool = True) -> jnp.ndarray:
        D = self.embedding_dim
        if self.feat_drop > 0:
            emb_seqs = nn.Dropout(self.feat_drop, deterministic=not train)(emb_seqs)
        B, L, _ = emb_seqs.shape
        pad = jnp.arange(L)[None, :] >= lens[:, None]  # True at padding
        emb_seqs = jnp.where(pad[..., None], 0.0, emb_seqs)
        ms = emb_seqs.sum(axis=1) / jnp.maximum(lens, 1)[:, None]
        idx = jnp.clip(lens - 1, 0, L - 1)
        xt = jnp.take_along_axis(emb_seqs, idx[:, None, None].repeat(D, axis=2), axis=1)[:, 0]
        ei = nn.Dense(D, use_bias=False, kernel_init=KERNEL_INIT, name="attn_i")(emb_seqs)
        et = nn.Dense(D, kernel_init=KERNEL_INIT, name="attn_t")(xt)[:, None, :]
        es = nn.Dense(D, use_bias=False, kernel_init=KERNEL_INIT, name="attn_s")(ms)[:, None, :]
        e = nn.Dense(1, use_bias=False, kernel_init=KERNEL_INIT, name="attn_e")(
            nn.sigmoid(ei + et + es))[..., 0]
        alpha = jnp.where(pad, 0.0, e)[..., None]
        ma = jnp.sum(alpha * emb_seqs, axis=1)
        ha = nn.Dense(D, kernel_init=KERNEL_INIT, name="fc_a")(ma)
        ht = nn.Dense(D, kernel_init=KERNEL_INIT, name="fc_t")(xt)
        return ha * ht


# --------------------------------------------------------------------------- #
# Caser
# --------------------------------------------------------------------------- #
class CaserEncoder(nn.Module):
    max_his: int
    num_horizon: int = 16
    num_vertical: int = 8
    l: int = 5

    @nn.compact
    def __call__(self, seq: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        B, L, D = seq.shape
        pad_len = self.max_his - L
        x = jnp.pad(seq, ((0, 0), (0, max(pad_len, 0)), (0, 0)))[..., None]  # NHWC
        out_v = nn.Conv(self.num_vertical, kernel_size=(self.max_his, 1),
                        padding="VALID", kernel_init=KERNEL_INIT, name="conv_v")(x)
        out_v = out_v.reshape(B, -1)
        out_hs = []
        for i in range(1, self.l + 1):
            h = nn.Conv(self.num_horizon, kernel_size=(i, D), padding="VALID",
                        kernel_init=KERNEL_INIT, name=f"conv_h{i}")(x)
            h = nn.relu(h[:, :, 0, :])  # [B, max_his-i+1, num_horizon]
            out_hs.append(jnp.max(h, axis=1))
        out_h = jnp.concatenate(out_hs, axis=1)
        return nn.Dense(D, kernel_init=KERNEL_INIT, name="fc")(
            jnp.concatenate([out_v, out_h], axis=1))
