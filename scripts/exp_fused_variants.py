"""Variant timing for the fused-Adam kernel design (dev script)."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rec_pangu_tpu.utils import enable_compilation_cache

enable_compilation_cache()

from rec_pangu_tpu.ops.kernels.embedding_grad import (
    CHUNK, _tile_rows, make_sort_plan, padded_rows, plan_chunks, stream_ids)

V = padded_rows(16 * 100_001)
D = 32
N = 8192 * 16
tile = _tile_rows(V)
rng = np.random.default_rng(0)
ids = rng.integers(0, 16 * 100_001, (N,), dtype=np.int64)
plan = {k: jnp.asarray(v) for k, v in make_sort_plan(ids, V).items()}
rows = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
table = jnp.zeros((V, D), jnp.float32)
mu = jnp.zeros_like(table)
nu = jnp.zeros_like(table)
K = plan_chunks(N, V)
istream = np.asarray(plan["sorted_ids"])
hyper = jnp.arange(8, dtype=jnp.float32) * 0 + 0.5


def acc_body(meta_ref, ids_ref, rows_ref, acc_ref):
    k = pl.program_id(0)
    m = meta_ref[k]
    row_base = (m >> 2) * tile
    ids_row = k % 8

    @pl.when(((m >> 1) & 1) == 1)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when((m & 1) == 1)
    def _acc():
        local = ids_ref[ids_row, :] - row_base
        onehot = (local[:, None] ==
                  jax.lax.broadcasted_iota(jnp.int32, (CHUNK, tile), 1)
                  ).astype(jnp.float32)
        r = rows_ref[:, :]
        hi = r.astype(jnp.bfloat16).astype(jnp.float32)
        lo = r - hi

        def dot_t(lhs):
            return jax.lax.dot_general(
                lhs, onehot, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)

        acc_ref[:] += dot_t(hi) + dot_t(lo)


def is_last(meta_ref, k):
    nk = jnp.minimum(k + 1, K - 1)
    return jnp.logical_or(k == K - 1,
                          (meta_ref[nk] >> 2) != (meta_ref[k] >> 2))


# --- variant A: p only, p_out = p - acc (2 heavy streams) ------------------
def kern_a(meta_ref, hyper_ref, ids_ref, rows_ref, p_ref, p_out, acc_ref):
    acc_body(meta_ref, ids_ref, rows_ref, acc_ref)

    @pl.when(is_last(meta_ref, pl.program_id(0)))
    def _apply():
        p_out[:] = p_ref[:, :] - hyper_ref[0] * acc_ref[:, :]


# --- variant B: full adam (6 heavy streams), cheap math --------------------
def kern_b(meta_ref, hyper_ref, ids_ref, rows_ref, p_ref, m_ref, v_ref,
           p_out, m_out, v_out, acc_ref):
    acc_body(meta_ref, ids_ref, rows_ref, acc_ref)

    @pl.when(is_last(meta_ref, pl.program_id(0)))
    def _apply():
        g = acc_ref[:, :]
        m_out[:] = m_ref[:, :] + g
        v_out[:] = v_ref[:, :] + g
        p_out[:] = p_ref[:, :] + g


# --- variant C: full adam with real math (current design) ------------------
def kern_c(meta_ref, hyper_ref, ids_ref, rows_ref, p_ref, m_ref, v_ref,
           p_out, m_out, v_out, acc_ref):
    acc_body(meta_ref, ids_ref, rows_ref, acc_ref)

    @pl.when(is_last(meta_ref, pl.program_id(0)))
    def _apply():
        g = acc_ref[:, :]
        b1 = hyper_ref[1]
        b2 = hyper_ref[2]
        mu_ = b1 * m_ref[:, :] + (1.0 - b1) * g
        nu_ = b2 * v_ref[:, :] + (1.0 - b2) * (g * g)
        m_out[:] = mu_
        v_out[:] = nu_
        p_out[:] = p_ref[:, :] - hyper_ref[0] * (mu_ * hyper_ref[4]) / (
            jnp.sqrt(nu_ * hyper_ref[5]) + hyper_ref[3])


def big_spec():
    return pl.BlockSpec((D, tile), lambda k, meta, hyper: (0, meta[k] >> 2),
                        memory_space=pltpu.VMEM)


def launch(kern, n_heavy_in, n_out):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((8, CHUNK), lambda k, meta, hyper: (k // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, D), lambda k, meta, hyper: (k, 0),
                         memory_space=pltpu.VMEM),
        ] + [big_spec() for _ in range(n_heavy_in)],
        out_specs=[big_spec() for _ in range(n_out)],
        scratch_shapes=[pltpu.VMEM((D, tile), jnp.float32)],
    )
    shape = [jax.ShapeDtypeStruct((D, V), jnp.float32)] * n_out

    @jax.jit
    def run(sorted_rows, *heavy):
        return pl.pallas_call(kern, grid_spec=grid_spec, out_shape=shape)(
            plan["meta"], hyper, jnp.asarray(istream), sorted_rows, *heavy)

    return run


def timeit(fn, *args, reps=20):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0][0, 0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0][0, 0])
    return (time.perf_counter() - t0) / reps * 1e3


sorted_rows = jnp.take(rows, plan["perm"], axis=0)
print("A (p in, p out, cheap):", round(timeit(launch(kern_a, 1, 1), sorted_rows, table.T), 2), "ms")
print("B (pmv in, pmv out, cheap):", round(timeit(launch(kern_b, 3, 3), sorted_rows, table.T, mu.T, nu.T), 2), "ms")
print("C (pmv in, pmv out, adam):", round(timeit(launch(kern_c, 3, 3), sorted_rows, table.T, mu.T, nu.T), 2), "ms")
