"""Decompose the ContraRec train step at the bench shape (VERDICT r4 weak
item 5): where do the ~31.7 ms sit — [3B] lookup, [3B] BERT4Rec encoder,
streaming CE, ContraLoss?  Host-augmented fused path (the bench leg config).
"""
import time

import numpy as np

from rec_pangu_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.models.sequence.contrarec import host_augment_sequences
from rec_pangu_tpu.ops.embedding import attach_item_plan
from rec_pangu_tpu.ops.numerics import safe_l2norm
from rec_pangu_tpu.models.sequence.contra_losses import contrarec_contra_loss
from rec_pangu_tpu.train.fused_update import maybe_enable_seq_fused_update
from rec_pangu_tpu.train.optim import make_optimizer
from rec_pangu_tpu.train.steps import create_train_state, make_train_step

B, L, V, D = 1024, 50, 1_000_000, 64

rng = np.random.default_rng(0)
enc = {"item_id": {"vocab_size": V}}
config = {"embedding_dim": D, "max_length": L}
hist = rng.integers(1, V, (B, L), dtype=np.int32)
batch = {
    "hist_item_list": hist,
    "hist_mask_list": (rng.random((B, L)) < 0.9).astype(np.float32),
    "target_item": rng.integers(1, V, (B,), dtype=np.int32),
}
aug_rng = np.random.default_rng(7)
aug1 = host_augment_sequences(aug_rng, hist, 3.0, 3.0, V - 1)
aug2 = host_augment_sequences(aug_rng, hist, 3.0, 3.0, V - 1)
batch["aug_all"] = np.concatenate([hist, aug1, aug2], axis=0)
attach_item_plan(batch, V + 1, D, ids_key="aug_all")

model = get_model("ContraRec")(enc_dict=enc, config=config)
state = create_train_state(model, batch, make_optimizer(1e-3, 1),
                           jax.random.PRNGKey(0))
state, fstep, _ = maybe_enable_seq_fused_update(state, model, batch,
                                                lr=1e-3, steps_per_epoch=1)
print("fused:", fstep is not None, flush=True)
train_step = fstep or make_train_step(False)
dbatch = jax.device_put(batch)
rngk = jax.random.PRNGKey(1)


def timeit(fn, *args, reps=10):
    out = fn(*args)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    return (time.perf_counter() - t0) / reps * 1e3


# full step first (fused step does not donate)
def step_time(reps=10):
    st = state
    for _ in range(3):
        st, out = train_step(st, dbatch, rngk)
    _ = float(out["loss"])
    t0 = time.perf_counter()
    for _ in range(reps):
        st, out = train_step(st, dbatch, rngk)
    _ = float(out["loss"])
    return (time.perf_counter() - t0) / reps * 1e3


print("full fused step:", round(step_time(), 1), "ms", flush=True)

all_seq = jnp.asarray(batch["aug_all"])
lengths = jnp.sum(jnp.asarray(batch["hist_mask_list"]), 1).astype(jnp.int32)
all_len = jnp.concatenate([lengths] * 3, axis=0)


@jax.jit
def lookup_grad(params):
    def f(p):
        emb = model.apply({"params": p}, None, False,
                          method=lambda m, _b, _t: m.item_emb(
                              all_seq, prefer_kernel_grad=True))
        return jnp.sum(emb * emb)

    return jax.grad(f)(params)


print("[3B] lookup fwd+bwd:", round(timeit(lookup_grad, state.params), 1),
      "ms", flush=True)

emb_in = jnp.asarray(rng.standard_normal((3 * B, L, D)), jnp.float32) * 0.1


@jax.jit
def encoder_grad(params, e):
    def f(p, ee):
        out = model.apply({"params": p}, None, False,
                          method=lambda m, _b, _t: m._encode(ee, all_len,
                                                             False))
        return jnp.sum(out * out)

    return jax.grad(f, (0, 1))(params, e)


print("[3B] encoder fwd+bwd:",
      round(timeit(encoder_grad, state.params, emb_in), 1), "ms", flush=True)


# CE alone
from rec_pangu_tpu.ops.softmax_ce import fused_softmax_ce_padded

users = jnp.asarray(rng.standard_normal((B, D)), jnp.float32) * 0.1
table = state.params["item_emb"]["table"]
pos = jnp.asarray(batch["target_item"], jnp.int32)


@jax.jit
def ce_grad(u, t):
    return jax.grad(
        lambda a, b: fused_softmax_ce_padded(a, b, pos, V + 1), (0, 1))(u, t)


print("CE fwd+bwd:", round(timeit(ce_grad, users, table), 1), "ms",
      flush=True)

# ContraLoss alone
f12 = safe_l2norm(jnp.asarray(rng.standard_normal((B, 2, D)), jnp.float32))


@jax.jit
def contra_grad(f):
    return jax.grad(lambda x: contrarec_contra_loss(x, pos, 0.2))(f)


print("ContraLoss fwd+bwd:", round(timeit(contra_grad, f12), 1), "ms",
      flush=True)
