"""Time the planned-forward pieces at the bench shape (dev script):
select-stream kernel, un-permute, backward permute, and tile-size variants.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rec_pangu_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import rec_pangu_tpu.ops.kernels.embedding_grad as eg

DIM = 32
V = eg.padded_rows(16 * 100_000)
N = 8192 * 16
rng = np.random.default_rng(0)
flat_ids = rng.integers(0, 16 * 100_000, (N,), dtype=np.int64)
plan = jax.device_put(eg.make_sort_plan(flat_ids, V))
ids_dev = jnp.asarray(flat_ids, jnp.int32)
table = jnp.asarray(rng.standard_normal((V, DIM)), jnp.float32)
istream = jax.jit(lambda p: eg.stream_ids(p, ids_dev, V))(plan)
K = int(plan["meta"].shape[0])
print(f"chunks K={K}, tiles={V // eg._tile_rows(V)}")


def timeit(fn, *args, reps=30):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / reps * 1e3


sel = jax.jit(lambda t, p, s: eg._select_stream(t, p, s))
print("select-stream kernel:", round(timeit(sel, table, plan, istream), 2), "ms")

stream_buf = sel(table, plan, istream)
unperm = jax.jit(lambda s, p: jnp.take(s, p["inv_perm"], axis=1).T)
print("un-permute (take axis1 from [D, K*128] + .T):",
      round(timeit(unperm, stream_buf, plan), 2), "ms")

full_fwd = jax.jit(lambda t, p: eg.planned_gather(t, ids_dev, p))
print("full planned_gather fwd:", round(timeit(full_fwd, table, plan), 2), "ms")

print("stream_ids:", round(timeit(jax.jit(
    lambda p: eg.stream_ids(p, ids_dev, V)), plan), 2), "ms")

plain = jax.jit(lambda t: jnp.take(t, ids_dev, axis=0))
print("plain XLA gather:", round(timeit(plain, table), 2), "ms")
