"""Decompose the IOCRec train step at the bench shape (dev script).

Times, in isolation: the full train step, the [3B] encoder stack
(_intention_emb fwd+bwd with a surrogate loss), the K-max streamed CE
(fwd+bwd), the InfoNCE head, and the item-table lookup gradient path.
"""
import time

import numpy as np

from rec_pangu_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.ops.embedding import attach_item_plan
from rec_pangu_tpu.ops.softmax_ce import fused_multimax_softmax_ce
from rec_pangu_tpu.train.optim import make_optimizer
from rec_pangu_tpu.train.steps import create_train_state, make_train_step

B, L, V, D, K = 1024, 50, 1_000_000, 64, 4

rng = np.random.default_rng(0)
enc = {"item_id": {"vocab_size": V}}
config = {"embedding_dim": D, "max_length": L, "K": K}
batch = {
    "hist_item_list": rng.integers(1, V, (B, L), dtype=np.int32),
    "hist_mask_list": (rng.random((B, L)) < 0.9).astype(np.float32),
    "target_item": rng.integers(1, V, (B,), dtype=np.int32),
}
model = get_model("IOCRec")(enc_dict=enc, config=config)
attach_item_plan(batch, V + 1, D)
state = create_train_state(model, batch, make_optimizer(1e-3, 1),
                           jax.random.PRNGKey(0))
train_step = make_train_step(state.batch_stats is not None)
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


def time_step(step, st, reps=10):
    for _ in range(2):
        st, out = step(st, dbatch, rngk)
    _ = float(out["loss"])
    t0 = time.perf_counter()
    for _ in range(reps):
        st, out = step(st, dbatch, rngk)
    _ = float(out["loss"])
    return (time.perf_counter() - t0) / reps * 1e3


# ---- K-max CE alone (fwd + bwd) -------------------------------------------
users = jnp.asarray(rng.standard_normal((B, K, D)), jnp.float32) * 0.1
items = jnp.asarray(rng.standard_normal((V + 1, D)), jnp.float32) * 0.1
pos = jnp.asarray(batch["target_item"], jnp.int32)


@jax.jit
def ce_fwd(u, it):
    return fused_multimax_softmax_ce(u, it, pos)


@jax.jit
def ce_grad(u, it):
    return jax.grad(lambda a, b: fused_multimax_softmax_ce(a, b, pos),
                    (0, 1))(u, it)


print("K-max CE fwd:", round(timeit(ce_fwd, users, items), 1), "ms", flush=True)
print("K-max CE fwd+bwd:", round(timeit(ce_grad, users, items), 1), "ms",
      flush=True)

# ---- encoder stack alone ([3B] pass, fwd+bwd surrogate) --------------------
all_seq = jnp.concatenate([dbatch["hist_item_list"]] * 3, axis=0)
all_len = jnp.sum(dbatch["hist_mask_list"], axis=-1).astype(jnp.int32)
all_len = jnp.concatenate([all_len] * 3, axis=0)


@jax.jit
def enc_grad(params):
    def f(p):
        out = model.apply({"params": p}, None, False,
                          method=lambda m, _b, _t: m._intention_emb(
                              all_seq, all_len, False))
        return jnp.sum(out * out)

    return jax.grad(f)(params)


print("[3B] encoder fwd+bwd:", round(timeit(enc_grad, state.params), 1), "ms",
      flush=True)

# ---- InfoNCE head alone ----------------------------------------------------
from rec_pangu_tpu.models.sequence.iocrec import info_nce_loss

d1 = jnp.asarray(rng.standard_normal((B * K, L * D)), jnp.float32)
d2 = jnp.asarray(rng.standard_normal((B * K, L * D)), jnp.float32)


@jax.jit
def nce_grad(a, b):
    return jax.grad(lambda x, y: info_nce_loss(x, y, 2.0), (0, 1))(a, b)


print("InfoNCE fwd+bwd:", round(timeit(nce_grad, d1, d2), 1), "ms", flush=True)

# ---- item lookup grad path ([3B*L] device-generated ids) -------------------
flat_params = state.params


@jax.jit
def lookup_grad(params):
    def f(p):
        emb = model.apply({"params": p}, None, False,
                          method=lambda m, _b, _t: m.item_emb(
                              all_seq, prefer_kernel_grad=True))
        return jnp.sum(emb * emb)

    return jax.grad(f)(params)


print("[3B] item lookup fwd+bwd:", round(timeit(lookup_grad, state.params), 1),
      "ms", flush=True)

# full step LAST: make_train_step donates the state, deleting the param
# buffers the piece profiles above close over
print("full step:", round(time_step(train_step, state), 1), "ms", flush=True)
