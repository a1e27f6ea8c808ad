"""SINE (parity: rec_pangu/models/sequence/sine.py:14-124): sparse-interest
network — prototype bank C [L, D], top-k concept activation, intention
assignment, per-interest attention, prototype-sequence aggregation.

The reference's argsort-based top-k concept selection (sine.py:72-77) becomes
jax.lax.top_k (static k, jit-friendly); note the reference sorts ascending and
takes the LAST k, i.e. top-k ascending order — top_k returns descending, which
only permutes the k concepts and is equivalent through the downstream softmax.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.initializers import torch_kaiming_normal
from ...ops.numerics import safe_l2norm
from ..base import SequenceModelBase, register_model

SINE_INIT = nn.initializers.normal(stddev=0.01)  # 1-D params (w2, w4) only
# >=2D params are kaiming-overwritten by the reference's reset_parameters()
# (sine.py:41 executes it; the 0.01-normal _init_weight is dead for them)
TORCH_KAIMING = torch_kaiming_normal()



@register_model("SINE")
class SINE(SequenceModelBase):
    # only table uses: the planned hist lookup + the full-softmax CE — both
    # captured by the fused-update step (train/fused_update.py)
    fused_update_compatible = True

    def setup(self):
        self.setup_base()
        cfg = self.config
        D = self.embedding_dim
        self.L = int(cfg.get("prototype_size", 500))
        self.k = int(cfg.get("interest_size", 4))
        self.tau = float(cfg.get("tau_ratio", 0.1))
        eps = float(cfg.get("layer_norm_eps", 1e-4))
        self.w1 = self.param("w1", TORCH_KAIMING, (D, D))
        self.w2 = self.param("w2", SINE_INIT, (D,))
        self.w3 = self.param("w3", TORCH_KAIMING, (D, D))
        self.w4 = self.param("w4", SINE_INIT, (D,))
        self.C = self.param("C", TORCH_KAIMING, (self.L, D))
        self.w_k_1 = self.param("w_k_1", TORCH_KAIMING, (self.k, D, D))
        self.w_k_2 = self.param("w_k_2", TORCH_KAIMING, (self.k, D))
        self.ln2 = nn.LayerNorm(epsilon=eps)
        self.ln4 = nn.LayerNorm(epsilon=eps)

    def __call__(self, batch, train: bool = True):
        D, k = self.embedding_dim, self.k
        x_u = self.item_emb(batch["hist_item_list"], batch.get("emb_plan"))  # [B, N, D]

        # concept activation (sine.py:63-77)
        a = nn.softmax(jnp.tanh(x_u @ self.w1) @ self.w2, axis=1)     # [B, N]
        z_u = jnp.einsum("bn,bnd->bd", a, x_u)                        # [B, D]
        s_u = z_u @ self.C.T                                          # [B, L]
        s_u_top, idx = jax.lax.top_k(s_u, k)                          # [B, k]
        c_u = jnp.take(self.C, idx, axis=0)                           # [B, k, D]
        C_u = c_u * nn.sigmoid(s_u_top)[..., None]

        # intention assignment (sine.py:81-85)
        w3_x_u_norm = safe_l2norm(x_u @ self.w3)
        C_u_norm = self.ln2(C_u)
        P_k_t = jnp.einsum("bnd,bkd->bnk", w3_x_u_norm, C_u_norm)
        P_k_t_b = nn.softmax(P_k_t, axis=2)           # over concepts
        P_k_t_b_t = P_k_t_b.transpose(0, 2, 1)        # [B, k, N]

        # attention weighting (sine.py:88-95)
        a_k = jnp.einsum("bnd,kde->bkne", x_u, self.w_k_1)
        P_t_k = nn.softmax(jnp.einsum("bkne,ke->bkn", jnp.tanh(a_k), self.w_k_2),
                           axis=2)

        # interest embedding generation (sine.py:98-102)
        mul_p = P_k_t_b_t * P_t_k                                      # [B, k, N]
        delta_k = safe_l2norm(jnp.einsum("bkn,bnd->bkd", mul_p, x_u))

        # prototype sequence (sine.py:105-108)
        x_u_bar = jnp.einsum("bnk,bkd->bnd", P_k_t_b, C_u)
        C_apt = nn.softmax(jnp.tanh(x_u_bar @ self.w3) @ self.w4, axis=1)  # [B, N]
        C_apt = self.ln4(jnp.einsum("bn,bnd->bd", C_apt, x_u_bar))[:, None, :]

        # aggregation (sine.py:111-113)
        e_k = jnp.einsum("bkd,bd->bk", delta_k, C_apt[:, 0]) / self.tau
        e_k_u = nn.softmax(e_k, axis=1)
        user_emb = jnp.einsum("bk,bkd->bd", e_k_u, delta_k)

        out = {"user_emb": user_emb}
        if train:
            out["loss"] = self.calculate_loss(user_emb, batch["target_item"],
                                              batch.get("emb_plan"))
        return out
