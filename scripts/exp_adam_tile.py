"""A/B the fused-Adam kernel's vocab-tile size at the bench shape (dev script).

The kernel shows ~6 us/tile against a ~1.9 us/tile HBM roofline at tile 2048
(784 grid steps for the 1.6M-row fused table) — if the gap is per-grid-step
overhead, larger tiles should close it roughly linearly until VMEM runs out.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from rec_pangu_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import rec_pangu_tpu.ops.kernels.embedding_grad as eg
import rec_pangu_tpu.ops.kernels.fused_adam as fa

BATCH, F, DIM = 8192, 16, 32
V = eg.padded_rows(16 * 100_000)  # the bench fused-table row count, padded
N = BATCH * F
rng = np.random.default_rng(0)
flat_ids = rng.integers(0, 16 * 100_000, (N,), dtype=np.int64)
rows = jnp.asarray(rng.standard_normal((N, DIM)), jnp.float32)
table = jnp.zeros((V, DIM), jnp.float32)
mu = jnp.zeros_like(table)
nu = jnp.zeros_like(table)
hyper = fa.adam_hyper(jnp.asarray(1, jnp.int32), 1e-3)


def timeit(fn, *args, reps=30):
    out = fn(*args)
    _ = float(out[0][0, 0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(out[0][0, 0])
    return (time.perf_counter() - t0) / reps * 1e3


orig = eg._tile_rows
for tile in (2048, 4096, 8192):
    eg._tile_rows = lambda n, _t=tile: _t
    fa._tile_rows = eg._tile_rows
    plan = eg.make_sort_plan(flat_ids, V)
    dplan = jax.device_put(plan)
    ids_dev = jnp.asarray(flat_ids, jnp.int32)

    @jax.jit
    def run(plan, rows, table, mu, nu):
        istream = eg.stream_ids(plan, ids_dev, V)
        rows_t = jnp.take(rows.T, plan["perm"], axis=1)
        return fa.planned_adam_update(plan, istream, rows_t.T.copy() if False else rows,
                                      table, mu, nu, hyper)

    # pass batch-order rows; planned_adam_update permutes internally
    try:
        ms = timeit(run, dplan, rows, table, mu, nu)
        print(f"tile {tile}: {ms:.2f} ms  ({V // tile} grid steps)", flush=True)
    except Exception as e:
        print(f"tile {tile}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
eg._tile_rows = orig
fa._tile_rows = orig
