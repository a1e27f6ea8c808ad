"""Sub-profile the IOCRec [3B] encoder: local transformer vs global attention
vs disentangle head (dev script) — the encoder is 45.7 ms of the 123.6 ms
step while its matmul work is only ~45 GFLOP (~1.4 ms at MXU rate), so the
cost must be elementwise/HBM structure; find which third."""
import time

import numpy as np

from rec_pangu_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.ops.embedding import attach_item_plan
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
attach_item_plan(batch, V + 1, D)
state = create_train_state(model, batch, make_optimizer(1e-3, 1),
                           jax.random.PRNGKey(0))
dbatch = jax.device_put(batch)
all_seq = jnp.concatenate([dbatch["hist_item_list"]] * 3, axis=0)
all_len = jnp.concatenate(
    [jnp.sum(dbatch["hist_mask_list"], axis=-1).astype(jnp.int32)] * 3, axis=0)


def timeit(fn, *args, reps=10):
    out = fn(*args)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    return (time.perf_counter() - t0) / reps * 1e3


def grad_of(method_fn, label):
    @jax.jit
    def g(params):
        def f(p):
            out = model.apply({"params": p}, None, False,
                              method=method_fn)
            return jnp.sum(out * out)

        return jax.grad(f)(params)

    print(f"{label}: {timeit(g, state.params):.1f} ms", flush=True)


# embeddings once (shared sub-input); each piece measured fwd+bwd
grad_of(lambda m, _b, _t: m._local_encoding(all_seq, False),
        "local transformer (3 blocks)")
grad_of(lambda m, _b, _t: m.global_seq_encoder(
    m.item_emb(all_seq, prefer_kernel_grad=True), False),
        "global encoder (incl. lookup)")
grad_of(lambda m, _b, _t: m.disentangle_encoder(
    m.item_emb(all_seq, prefer_kernel_grad=True),
    m.item_emb(all_seq, prefer_kernel_grad=True), all_len),
        "disentangle head (2x, incl. 2 lookups)")
