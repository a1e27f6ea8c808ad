"""Model base classes + registry.

The universal model contract (parity with SURVEY.md §1): every model is a pure
function of a fused batch dict and returns a dict —

* ranking:    ``{'pred': sigmoid(logit), 'loss': bce}``   (loss only when train)
* multi-task: ``{'task{i}_pred': ..., 'loss': ...}``
* sequence:   ``{'user_emb': [B,D] or [B,K,D], 'loss': full-softmax CE}``

Reference counterparts: rec_pangu/models/base_model.py
(BaseModel:14, SequenceBaseModel:93).  The registry replaces the reference's
``eval(model_name)`` dispatch (rec_pangu/benchmark_trainer.py:66).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..data.encoder import OOV_SENTINEL, FeatureSpec
from ..ops.embedding import ItemEmbedding

# --------------------------------------------------------------------------- #
# registry
# --------------------------------------------------------------------------- #
MODEL_REGISTRY: Dict[str, type] = {}


def register_model(name: str) -> Callable[[type], type]:
    def deco(cls: type) -> type:
        MODEL_REGISTRY[name] = cls
        MODEL_REGISTRY[name.lower()] = cls
        return cls

    return deco


def get_model(name: str) -> type:
    if name in MODEL_REGISTRY:
        return MODEL_REGISTRY[name]
    if name.lower() in MODEL_REGISTRY:
        return MODEL_REGISTRY[name.lower()]
    raise KeyError(f"Unknown model {name!r}; registered: "
                   f"{sorted(k for k in MODEL_REGISTRY if not k.islower())}")


# --------------------------------------------------------------------------- #
# ranking / multitask base
# --------------------------------------------------------------------------- #
class RankModelBase(nn.Module):
    """Children declare hyperparam fields + ``enc_dict`` and implement
    ``__call__(batch, train)``."""

    @property
    def spec(self) -> FeatureSpec:
        return FeatureSpec.from_enc_dict(self.enc_dict)

    @property
    def num_sparse(self) -> int:
        return self.spec.num_sparse

    @property
    def num_dense(self) -> int:
        return self.spec.num_dense

    def dnn_input_dim(self, embedding_dim: int) -> int:
        """Parity: rec_pangu/models/utils.py:140 (get_dnn_input_dim)."""
        return self.num_sparse * embedding_dim + self.num_dense


# --------------------------------------------------------------------------- #
# sequence base
# --------------------------------------------------------------------------- #
class SequenceModelBase(nn.Module):
    """Shared machinery for sequence-recall models.

    Children call ``self.setup_base()`` from their ``setup`` to get
    ``self.item_emb`` (+ per-cate-col embeddings) and use the helpers below.
    ``config`` keys follow the reference (embedding_dim, max_length, ...).
    """

    enc_dict: Any = None
    config: Any = None

    # True on models whose ONLY item-table uses in the train forward are the
    # planned hist-list lookup and the full-softmax CE — the two paths the
    # fused-update capture mechanism covers (train/fused_update.py).  Models
    # with extra table reads (target-item gathers for interest selection,
    # contrastive augmentations, in-forward renorms) must stay False or their
    # table gradient would silently lose those terms.
    fused_update_compatible = False
    # Extra per-sample id columns ([B]-shaped batch keys) whose GRADIENT-
    # CARRYING reads should ride the same host sort plan as the hist lookup:
    # the trainer concatenates [hist | extras] into batch["lookup_all"]
    # (r5, VERDICT r4 item 5), the model does ONE planned lookup and slices.
    # Models using this set fused_lookup_key = "lookup_all".  (Plain class
    # attr, NOT annotated: an annotation would make it a flax dataclass
    # field whose base default shadows subclass overrides.)
    lookup_extra = ()
    # True -> the trainer pre-samples batch["neg_items"] (uniform in
    # [1, vocab-1), host rng) so device-generated negative ids don't defeat
    # the host plan.
    host_negatives = False
    # False -> the model's loss never routes through the captured streaming
    # CE (no full-softmax term); the fused step then skips the dense-grad
    # kernel stream entirely.
    fused_uses_ce = True
    # Param paths (tuples into the params tree) the trainer L2-renormalizes
    # rowwise AFTER every optimizer step — the functional equivalent of the
    # reference's in-place ``weight.copy_(normalize(weight))`` at the top of
    # each forward (e.g. CMI, cmi.py:62-69): projecting after step t is the
    # same weights the next forward sees.  Models with this set are clamped
    # to steps_per_call=1 (the projection is per-step).
    renorm_param_paths = ()

    def setup_base(self) -> None:
        item_col = self.config.get("item_col", "item_id")
        vocab = int(self.enc_dict[item_col][OOV_SENTINEL])
        dim = int(self.config["embedding_dim"])
        # config['emb_init_std'] overrides the torch-kaiming table init —
        # smaller inits measurably lift retrieval recall on small corpora
        # (see BASELINE.md); the default reproduces the reference
        std = self.config.get("emb_init_std")
        std = float(std) if std is not None else None
        self.item_emb = ItemEmbedding(vocab, dim, init_std=std)
        cate_embs = {}
        for col in self.config.get("cate_cols", []) or []:
            cate_embs[col] = ItemEmbedding(int(self.enc_dict[col][OOV_SENTINEL]),
                                           dim, init_std=std)
        self.cate_embs = cate_embs

    @property
    def embedding_dim(self) -> int:
        return int(self.config["embedding_dim"])

    @property
    def max_length(self) -> int:
        return int(self.config["max_length"])

    def output_items(self) -> jnp.ndarray:
        """Full item table [V, D] (row 0 zeroed; parity: base_model.py:155-162)."""
        return self.item_emb.all_items()

    def calculate_loss(self, user_emb: jnp.ndarray, pos_item: jnp.ndarray,
                       plan: Optional[dict] = None) -> jnp.ndarray:
        """Training loss of user_emb against the item corpus.

        Default is the reference's full-softmax CE (base_model.py:124-138 —
        the B x V hot matmul).  ``config['loss_type'] = 'sampled'`` switches
        to sampled softmax with ``config['num_negatives']`` (default 1024)
        shared uniform negatives — the scale knob for industrial vocabularies
        where B x V no longer fits the step budget.

        ``plan`` (``batch["emb_plan"]``, passed by fused-update-compatible
        models) may carry a 'capture' dict: the CE's table gradient then
        routes to the zero leaf ``capture["ce_t"]`` and the table itself is
        held out of autodiff (train/fused_update.py sequence path).
        """
        cap = plan.get("capture") if isinstance(plan, dict) else None
        if cap is not None and "ce_t" in cap:
            from ..ops.softmax_ce import fused_softmax_ce_captured

            return fused_softmax_ce_captured(
                user_emb, jax.lax.stop_gradient(self.item_emb.table),
                pos_item, cap["ce_t"], self.item_emb.vocab_size)
        if self.config.get("loss_type", "full") == "sampled":
            return self.calculate_sampled_loss(
                user_emb, pos_item, int(self.config.get("num_negatives", 1024)))
        import os

        from ..ops.softmax_ce import (CHUNK_V, _FUSED_MIN_VOCAB,
                                      full_softmax_ce, fused_softmax_ce_padded)

        table = self.item_emb.table
        vocab = self.item_emb.vocab_size
        fused_ok = os.environ.get("REC_PANGU_TPU_FUSED_CE", "auto") \
            not in ("0", "off", "false")  # the naive-path parity escape hatch
        if (fused_ok and vocab >= _FUSED_MIN_VOCAB
                and table.shape[0] % CHUNK_V == 0):
            # stream the raw padded table — skips the all_items() slice+mask
            # copy and the CE pad/slice copies (3 full-table passes per step)
            return fused_softmax_ce_padded(user_emb, table, pos_item, vocab)
        # streams the [B, V] logits chunk-wise for big vocabularies instead
        # of materializing them (ops/softmax_ce.py); naive below the threshold
        return full_softmax_ce(user_emb, self.output_items(), pos_item)

    def calculate_sampled_loss(self, user_emb: jnp.ndarray, pos_item: jnp.ndarray,
                               num_negatives: int = 1024) -> jnp.ndarray:
        """Sampled-softmax CE: positive vs a batch-shared set of uniform
        negative items (ids >= 1; 0 is padding)."""
        all_items = self.output_items()
        v = all_items.shape[0]
        rng = (self.make_rng("dropout") if self.has_rng("dropout")
               else jax.random.PRNGKey(0))
        neg_ids = jax.random.randint(rng, (num_negatives,), 1, v)
        pos = pos_item.reshape(-1)
        pos_scores = jnp.sum(user_emb * jnp.take(all_items, pos, axis=0),
                             axis=-1, keepdims=True)
        neg_scores = jnp.dot(user_emb, jnp.take(all_items, neg_ids, axis=0).T,
                             preferred_element_type=jnp.float32)
        logits = jnp.concatenate([pos_scores, neg_scores], axis=1)
        return -jnp.mean(jax.nn.log_softmax(logits, axis=-1)[:, 0])

    def calculate_multimax_sampled_loss(self, user_embs: jnp.ndarray,
                                        pos_item: jnp.ndarray,
                                        num_negatives: int = 1024) -> jnp.ndarray:
        """Sampled K-max CE for [B, K, D] multi-interest embeddings (r5,
        VERDICT r4 item 7): ``CE(max_k u_bk . item)`` over the positive plus
        a batch-shared set of uniform negatives — the same negative-sharing
        scheme as ``calculate_sampled_loss``, with the K-max applied to every
        candidate's logit exactly as the exact kernel does
        (ops/kernels/multimax_ce.py).  The scale knob for vocabularies past
        the exact K-max CE's budget."""
        all_items = self.output_items()
        v = all_items.shape[0]
        rng = (self.make_rng("dropout") if self.has_rng("dropout")
               else jax.random.PRNGKey(0))
        neg_ids = jax.random.randint(rng, (num_negatives,), 1, v)
        pos = pos_item.reshape(-1)
        pos_scores = jnp.max(
            jnp.sum(user_embs * jnp.take(all_items, pos, axis=0)[:, None, :],
                    axis=-1), axis=1, keepdims=True)           # [B, 1]
        neg_scores = jnp.max(
            jnp.einsum("bkd,nd->bkn", user_embs,
                       jnp.take(all_items, neg_ids, axis=0)), axis=1)  # [B, N]
        logits = jnp.concatenate([pos_scores, neg_scores], axis=1)
        return -jnp.mean(jax.nn.log_softmax(logits, axis=-1)[:, 0])

    @staticmethod
    def gather_indexes(output: jnp.ndarray, gather_index: jnp.ndarray) -> jnp.ndarray:
        """[B, L, D] gathered at per-row index [B] -> [B, D] (base_model.py:140-153)."""
        idx = gather_index.reshape(-1, 1, 1)
        return jnp.take_along_axis(output, jnp.broadcast_to(idx, (output.shape[0], 1, output.shape[2])), axis=1)[:, 0]

    @staticmethod
    def get_attention_mask(attention_mask: jnp.ndarray) -> jnp.ndarray:
        """[B, L] 0/1 mask -> additive causal mask [B, 1, L, L] with -1e6 at
        masked positions (parity: base_model.py:164-193)."""
        L = attention_mask.shape[-1]
        ext = attention_mask[:, None, None, :]  # [B,1,1,L]
        causal = jnp.tril(jnp.ones((1, 1, L, L), dtype=attention_mask.dtype))
        combined = ext * causal
        return (1.0 - combined) * -1e6
