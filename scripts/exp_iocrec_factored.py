"""Decompose the round-5 factored IOCRec step: factors fwd+bwd, the global
encoder kernel alone, the CL-path dense materialization, and the InfoNCE
head — the pieces the factored-disentangle restructure changed (dev script).
"""
import time

import numpy as np

from rec_pangu_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.train.optim import make_optimizer
from rec_pangu_tpu.train.steps import create_train_state

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
state = create_train_state(model, batch, make_optimizer(1e-3, 1),
                           jax.random.PRNGKey(0))


def timeit(fn, *args, reps=10):
    out = fn(*args)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    return (time.perf_counter() - t0) / reps * 1e3


all_seq = jnp.concatenate([jnp.asarray(batch["hist_item_list"])] * 3, axis=0)
all_len = jnp.sum(jnp.asarray(batch["hist_mask_list"]), axis=-1).astype(jnp.int32)
all_len = jnp.concatenate([all_len] * 3, axis=0)

from rec_pangu_tpu.models.sequence.iocrec import IOCRec, info_nce_loss


# ---- factors fwd+bwd (surrogate over the factor leaves) --------------------
@jax.jit
def factors_grad(params):
    def f(p):
        out = model.apply({"params": p}, None, False,
                          method=lambda m, _b, _t: m._intention_factors(
                              all_seq, all_len, False))
        return sum(jnp.sum(leaf * leaf)
                   for leaf in jax.tree_util.tree_leaves(out))

    return jax.grad(f)(params)


print("[3B] factors fwd+bwd:", round(timeit(factors_grad, state.params), 1),
      "ms", flush=True)


# ---- the full train-path head: factors -> user_emb + CL dense + InfoNCE ----
@jax.jit
def head_grad(params):
    def f(p):
        def run(m, _b, _t):
            f3 = m._intention_factors(all_seq, all_len, False)
            seq_len = all_len[:B]
            idx = jnp.clip(seq_len - 1, 0, L - 1)
            u = f3.slice_rows(0, B).gather_user_emb(idx)
            cl = m._cl_loss(f3, B)
            return jnp.sum(u * u) + cl

        return model.apply({"params": p}, None, False, method=run)

    return jax.grad(f)(params)


print("[3B] factors+gather+CL fwd+bwd:",
      round(timeit(head_grad, state.params), 1), "ms", flush=True)


# ---- global encoder alone --------------------------------------------------
emb = jnp.asarray(rng.standard_normal((3 * B, L, D)), jnp.float32) * 0.1


@jax.jit
def global_grad(params, e):
    def f(p, ee):
        out = model.apply({"params": p}, None, False,
                          method=lambda m, _b, _t: m.global_seq_encoder(
                              ee, False))
        return jnp.sum(out * out)

    return jax.grad(f, (0, 1))(params, e)


print("[3B] global encoder fwd+bwd:",
      round(timeit(global_grad, state.params, emb), 1), "ms", flush=True)


# ---- CL dense materialization alone ---------------------------------------
al = jnp.asarray(rng.standard_normal((2 * B, K, L)), jnp.float32)
cl_ = jnp.asarray(rng.standard_normal((2 * B, L, D)), jnp.float32)
ag = jnp.asarray(rng.standard_normal((2 * B, K, L)), jnp.float32)
cg = jnp.asarray(rng.standard_normal((2 * B, L, D)), jnp.float32)
beta = jnp.asarray(rng.standard_normal((D,)), jnp.float32)


@jax.jit
def cl_grad(al, cl_, ag, cg, beta):
    def f(a1, c1, a2, c2, b):
        y = (jnp.einsum("bkl,bld->bkld", a1, c1)
             + jnp.einsum("bkl,bld->bkld", a2, c2) + 2.0 * b)
        d1 = y[:B].reshape(B * K, -1)
        d2 = y[B:].reshape(B * K, -1)
        return info_nce_loss(d1, d2, 2.0)

    return jax.grad(f, (0, 1, 2, 3, 4))(al, cl_, ag, cg, beta)


print("CL dense+InfoNCE fwd+bwd:",
      round(timeit(cl_grad, al, cl_, ag, cg, beta), 1), "ms", flush=True)
