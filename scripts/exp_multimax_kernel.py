"""A/B: Pallas K-max CE kernels vs the XLA scan at the bench shape
(dev script).  B=1024, K=4, V=1M, D=64."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rec_pangu_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from rec_pangu_tpu.ops import softmax_ce as sc

B, K, V, D = 1024, 4, 1_000_000, 64
rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((B, K, D)), jnp.float32) * 0.1
items = jnp.asarray(rng.standard_normal((V, D)), jnp.float32) * 0.1
pos = jnp.asarray(rng.integers(0, V, (B,)), jnp.int32)


def timeit(fn, *args, reps=10):
    out = fn(*args)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    return (time.perf_counter() - t0) / reps * 1e3


for flag in ("0", "auto"):
    os.environ["REC_PANGU_TPU_MULTIMAX_KERNEL"] = flag

    @jax.jit
    def fwd(a, b):
        return sc.fused_multimax_softmax_ce(a, b, pos)

    @jax.jit
    def fwdbwd(a, b):
        return jax.grad(
            lambda x, y: sc.fused_multimax_softmax_ce(x, y, pos), (0, 1))(a, b)

    name = "scan" if flag == "0" else "pallas"
    print(f"{name:7s} fwd: {timeit(fwd, u, items):.1f} ms", flush=True)
    print(f"{name:7s} fwd+bwd: {timeit(fwdbwd, u, items):.1f} ms", flush=True)
