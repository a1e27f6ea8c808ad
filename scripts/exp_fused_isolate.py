"""Isolate the fused-Adam kernel's cost components (dev script)."""
import functools as ft
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rec_pangu_tpu.utils import enable_compilation_cache

enable_compilation_cache()

from rec_pangu_tpu.ops.kernels.embedding_grad import (
    CHUNK, _tile_rows, make_sort_plan, padded_rows, stream_ids)
from rec_pangu_tpu.ops.kernels.fused_adam import NBUF, adam_hyper

V = padded_rows(16 * 100_001)
D = 32
N = 8192 * 16
tile = _tile_rows(V)
T = V // tile
rng = np.random.default_rng(0)
ids_np = rng.integers(0, 16 * 100_001, (N,), dtype=np.int64)
plan = {k: jnp.asarray(v) for k, v in make_sort_plan(ids_np, V).items()}
K = int(plan["meta"].shape[0])
rows = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
rows_t = jnp.take(rows.T, plan["perm"], axis=1)
istream = stream_ids(plan, jnp.asarray(ids_np, jnp.int32), V)
table = jnp.zeros((V, D), jnp.float32)
hyper = adam_hyper(jnp.asarray(1, jnp.int32), 1e-3)


def adam_apply(hyper_ref, g, p_ref, m_ref, v_ref, p_out, m_out, v_out):
    lr, b1, b2, eps = hyper_ref[0], hyper_ref[1], hyper_ref[2], hyper_ref[3]
    mu = b1 * m_ref[:, :] + (1.0 - b1) * g
    nu = b2 * v_ref[:, :] + (1.0 - b2) * (g * g)
    m_out[:] = mu
    v_out[:] = nu
    p_out[:] = p_ref[:, :] - lr * (mu * hyper_ref[4]) / (
        jnp.sqrt(nu * hyper_ref[5]) + eps)


# V1: pure six-stream Adam, zero grad (no chunk machinery at all)
def kern_stream(starts_ref, hyper_ref, ids_hbm, rows_hbm, p_ref, m_ref, v_ref,
                p_out, m_out, v_out, acc_ref, ids_buf, rows_buf, qn_ref,
                sem_i, sem_r):
    adam_apply(hyper_ref, acc_ref[:, :] * 0.0, p_ref, m_ref, v_ref,
               p_out, m_out, v_out)


# V2: chunk DMA ring (wait + refill), grad = cheap elementwise of the buffer
def kern_dma(starts_ref, hyper_ref, ids_hbm, rows_hbm, p_ref, m_ref, v_ref,
             p_out, m_out, v_out, acc_ref, ids_buf, rows_buf, qn_ref,
             sem_i, sem_r):
    t = pl.program_id(0)
    c0 = starts_ref[t]
    c1 = starts_ref[t + 1]
    used = starts_ref[T]

    def dma_pair(q, slot):
        return (pltpu.make_async_copy(ids_hbm.at[pl.ds(q, 1), :],
                                      ids_buf.at[pl.ds(slot, 1), :],
                                      sem_i.at[slot]),
                pltpu.make_async_copy(rows_hbm.at[:, pl.ds(q * CHUNK, CHUNK)],
                                      rows_buf.at[slot], sem_r.at[slot]))

    def issue(q):
        di, dr = dma_pair(q, jax.lax.rem(q, NBUF))
        di.start()
        dr.start()

    @pl.when(t == 0)
    def _warm():
        jax.lax.fori_loop(0, jnp.minimum(NBUF, used),
                          lambda q, _: (issue(q), 0)[1], 0)
        qn_ref[0] = jnp.minimum(NBUF, used)

    acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(c, _):
        slot = jax.lax.rem(c, NBUF)
        di, dr = dma_pair(c, slot)
        di.wait()
        dr.wait()
        acc_ref[:, :CHUNK] += rows_buf[slot]  # cheap consume, no matmul
        qn = qn_ref[0]

        @pl.when(qn < used)
        def _refill():
            issue(qn)

        qn_ref[0] = qn + jnp.where(qn < used, 1, 0)
        return 0

    jax.lax.fori_loop(c0, c1, body, 0)
    adam_apply(hyper_ref, acc_ref[:, :], p_ref, m_ref, v_ref,
               p_out, m_out, v_out)


def launch(kern):
    def big():
        return pl.BlockSpec((D, tile), lambda t, s, h: (0, t),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  big(), big(), big()],
        out_specs=[big(), big(), big()],
        scratch_shapes=[
            pltpu.VMEM((D, tile), jnp.float32),
            pltpu.VMEM((NBUF, CHUNK), jnp.int32),
            pltpu.VMEM((NBUF, D, CHUNK), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ])
    shape = [jax.ShapeDtypeStruct((D, V), jnp.float32)] * 3

    @jax.jit
    def run(rt, p, m, v):
        return pl.pallas_call(kern, grid_spec=grid_spec, out_shape=shape)(
            plan["tile_starts"], hyper, istream, rt, p.T, m.T, v.T)

    return run


def timeit(fn, *args, reps=20):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0][0, 0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0][0, 0])
    return (time.perf_counter() - t0) / reps * 1e3


z = jnp.zeros_like(table)
print("V1 stream-only adam:", round(timeit(launch(kern_stream), rows_t, table, z, z), 2), "ms")
print("V2 + chunk DMA ring:", round(timeit(launch(kern_dma), rows_t, table, z, z), 2), "ms")
