"""Multi-interest extraction layers.

* MultiInterestSelfAttention <- rec_pangu/models/layers/multi_interest.py:11-53
  (ComiRec-SA): A = softmax_seq(tanh(H W1) W2 + mask), interests = A^T H.
* CapsuleNetwork <- multi_interest.py:56-161 (MIND / ComiRec-DR): dynamic
  routing with 3 fixed iterations, squash, masked softmax over the sequence,
  stop-gradient on the first two iterations' inputs only through the routing
  logits (routing logits are non-trainable accumulators), bilinear types
  0 (shared linear, random-init logits), 1 (per-interest linear),
  2 (per-position weight tensor, zero-init logits).

TPU notes: routing is a static 3-step Python loop of einsums (compiles to 3
fused matmul blocks); the per-sample routing logits live in registers, not
params.  MIND's gaussian-init logits come from an explicit rng.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .initializers import torch_kaiming_normal

# reference constructors use torch.rand, but reset_parameters() overwrites
# every >=2D param with kaiming-normal (base_model.py:42-59) — replicate the
# EXECUTED init, not the dead constructor one
TORCH_KAIMING = torch_kaiming_normal()
KERNEL_INIT = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class MultiInterestSelfAttention(nn.Module):
    num_interests: int
    d: int = 0  # 0 -> 4 * embedding_dim

    @nn.compact
    def __call__(self, sequence_embeddings: jnp.ndarray,
                 mask: jnp.ndarray = None) -> jnp.ndarray:
        D = sequence_embeddings.shape[-1]
        d = self.d or D * 4
        W1 = self.param("W1", TORCH_KAIMING, (D, d))
        W2 = self.param("W2", TORCH_KAIMING, (d, self.num_interests))
        H = jnp.tanh(jnp.einsum("bse,ed->bsd", sequence_embeddings, W1))
        A = jnp.einsum("bsd,dk->bsk", H, W2)
        if mask is not None:
            if mask.ndim == 2:
                mask = mask[..., None]
            A = A + -1e9 * (1.0 - mask.astype(A.dtype))
        A = nn.softmax(A, axis=1)  # over sequence
        return jnp.einsum("bsk,bse->bke", A, sequence_embeddings)


def _squash(s: jnp.ndarray) -> jnp.ndarray:
    norm_sq = jnp.sum(jnp.square(s), axis=-1, keepdims=True)
    return (norm_sq / (1 + norm_sq) / jnp.sqrt(norm_sq + 1e-9)) * s


class CapsuleNetwork(nn.Module):
    hidden_size: int
    seq_len: int
    bilinear_type: int = 2
    interest_num: int = 4
    routing_times: int = 3
    hard_readout: bool = True
    relu_layer: bool = False

    @nn.compact
    def __call__(self, item_eb: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        B = item_eb.shape[0]
        K, S, H = self.interest_num, self.seq_len, self.hidden_size

        if self.bilinear_type == 0:  # MIND: shared projection, tiled
            proj = nn.Dense(H, use_bias=False, kernel_init=KERNEL_INIT,
                            name="linear")(item_eb)  # [B,S,H]
            item_eb_hat = jnp.tile(proj, (1, 1, K))
        elif self.bilinear_type == 1:
            item_eb_hat = nn.Dense(H * K, use_bias=False, kernel_init=KERNEL_INIT,
                                   name="linear")(item_eb)
        else:  # ComiRec-DR: per-position weight tensor
            w = self.param("w", TORCH_KAIMING, (1, S, K * H, H))
            item_eb_hat = jnp.sum(w * item_eb[:, :, None, :], axis=3)  # [B,S,K*H]

        item_eb_hat = item_eb_hat.reshape(B, S, K, H).transpose(0, 2, 1, 3)  # [B,K,S,H]
        # reference's stop_grad flag defaults False (multi_interest.py:86), so
        # gradients flow through the routing iterations exactly as in torch
        item_eb_hat_iter = item_eb_hat

        if self.bilinear_type > 0:
            capsule_weight = jnp.zeros((B, K, S), dtype=item_eb.dtype)
        else:  # MIND: gaussian random init (non-trainable accumulator)
            rng = self.make_rng("routing") if self.has_rng("routing") else jax.random.PRNGKey(0)
            capsule_weight = jax.lax.stop_gradient(
                jax.random.normal(rng, (B, K, S), dtype=item_eb.dtype))

        atten_mask = jnp.repeat(mask[:, None, :].astype(item_eb.dtype), K, axis=1)  # [B,K,S]
        interest_capsule = jnp.zeros((B, K, 1, H), dtype=item_eb.dtype)
        for i in range(self.routing_times):
            c = nn.softmax(capsule_weight, axis=-1)
            c = jnp.where(atten_mask == 0, 0.0, c)[:, :, None, :]  # [B,K,1,S]
            if i < self.routing_times - 1:
                interest_capsule = _squash(jnp.einsum(
                    "bkls,bksh->bklh", c, item_eb_hat_iter))
                delta = jnp.einsum("bksh,bklh->bks", item_eb_hat_iter,
                                   interest_capsule)
                capsule_weight = capsule_weight + delta
            else:
                interest_capsule = _squash(jnp.einsum(
                    "bkls,bksh->bklh", c, item_eb_hat))

        interest_capsule = interest_capsule.reshape(B, K, H)
        if self.relu_layer:
            h = nn.Dense(H, use_bias=False, kernel_init=KERNEL_INIT,
                         name="relu_proj")(interest_capsule)
            interest_capsule = nn.relu(h)
        return interest_capsule
