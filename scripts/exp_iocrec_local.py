"""A/B the IOCRec local-transformer cost drivers at the bench shape
[3B=3072, L=50, D=64] (dev script): dropout RNG impl (threefry vs rbg),
dropout on/off, and bf16 activations.  The committed sub-profile
(exp_iocrec_encoder.py) shows the 3-block local transformer at 28.2 ms
fwd+bwd against ~1 ms of MXU work — this isolates which structure owns it.
"""
import time

from rec_pangu_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from rec_pangu_tpu.ops.sequence_enc import TransformerEncoder

B, L, D = 3072, 50, 64


def timeit(fn, *args, reps=10):
    out = fn(*args)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    return (time.perf_counter() - t0) / reps * 1e3


rng = np.random.default_rng(0)
x32 = jnp.asarray(rng.standard_normal((B, L, D), dtype=np.float32))
mask = jnp.tril(jnp.ones((B, 1, L, L), bool))

enc = TransformerEncoder(n_layers=3, n_heads=2, inner_size=128,
                         hidden_dropout_prob=0.5, attn_dropout_prob=0.5,
                         hidden_act="relu")
params = enc.init({"params": jax.random.PRNGKey(0),
                   "dropout": jax.random.PRNGKey(1)}, x32, mask, True)


def bench(label, train, key, dtype):
    x = x32.astype(dtype)

    @jax.jit
    def g(p, x):
        def f(p, x):
            out = enc.apply(p, x, mask, train, rngs={"dropout": key})
            return jnp.sum((out * out).astype(jnp.float32))

        return jax.grad(f, argnums=(0, 1))(p, x)

    print(f"{label}: {timeit(g, params, x):.1f} ms", flush=True)


k_tf = jax.random.PRNGKey(2)
k_rbg = jax.random.key(2, impl="rbg")
bench("f32  threefry dropout", True, k_tf, jnp.float32)
bench("f32  rbg      dropout", True, k_rbg, jnp.float32)
bench("f32  no       dropout", False, k_tf, jnp.float32)
bench("bf16 threefry dropout", True, k_tf, jnp.bfloat16)
bench("bf16 rbg      dropout", True, k_rbg, jnp.bfloat16)
bench("bf16 no       dropout", False, k_tf, jnp.bfloat16)
