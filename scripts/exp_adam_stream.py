"""Isolate the fused-Adam kernel's HBM streaming efficiency (dev script).

Variants at the bench table shape (1,605,632 x 32 f32 p/m/v):
  1. pure-stream: p/m/v in -> Adam(g=0) -> p/m/v out, no chunk machinery.
  2. pure-stream + dummy chunk ring (warm + waits) to price the scalar work.
  3. the real planned_adam_update (reference point).
  4. XLA dense Adam (jnp expression over p/m/v/g) — the compiler baseline.
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
import rec_pangu_tpu.ops.kernels.fused_adam as fa

DIM = 32
V = eg.padded_rows(16 * 100_000)
TILE = 2048
T_TILES = V // TILE

rng = np.random.default_rng(0)
table = jnp.asarray(rng.standard_normal((V, DIM)), jnp.float32)
mu = jnp.zeros_like(table)
nu = jnp.ones_like(table)
hyper = fa.adam_hyper(jnp.asarray(1, jnp.int32), 1e-3)


def timeit(fn, *args, reps=30):
    out = fn(*args)
    _ = float(out[0][0, 0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(out[0][0, 0])
    return (time.perf_counter() - t0) / reps * 1e3


# ---- 1. pure streaming Adam ---------------------------------------------------
def _stream_kernel(hyper_ref, p_ref, m_ref, v_ref, p_out, m_out, v_out):
    lr = hyper_ref[0]
    b1 = hyper_ref[1]
    b2 = hyper_ref[2]
    eps = hyper_ref[3]
    inv_b1c = hyper_ref[4]
    inv_b2c = hyper_ref[5]
    g = jnp.zeros_like(p_ref[:, :])
    m2 = b1 * m_ref[:, :] + (1.0 - b1) * g
    v2 = b2 * v_ref[:, :] + (1.0 - b2) * (g * g)
    m_out[:] = m2
    v_out[:] = v2
    p_out[:] = p_ref[:, :] - lr * (m2 * inv_b1c) / (jnp.sqrt(v2 * inv_b2c) + eps)


def big():
    return pl.BlockSpec((DIM, TILE), lambda t, hyper: (0, t),
                        memory_space=pltpu.VMEM)


grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1,
    grid=(T_TILES,),
    in_specs=[big(), big(), big()],
    out_specs=[big(), big(), big()],
    scratch_shapes=[],
)
shape = jax.ShapeDtypeStruct((DIM, V), jnp.float32)


@jax.jit
def pure_stream(table, mu, nu):
    p, m, v = pl.pallas_call(
        _stream_kernel, grid_spec=grid_spec, out_shape=[shape] * 3,
        input_output_aliases={1: 0, 2: 1, 3: 2},
    )(hyper, table.T, mu.T, nu.T)
    return p.T, m.T, v.T


print("pure-stream pallas Adam (6 passes, 1.23 GB):",
      round(timeit(pure_stream, table, mu, nu), 2), "ms", flush=True)


# ---- 4. XLA dense Adam --------------------------------------------------------
g_dense = jnp.zeros_like(table)


@jax.jit
def xla_adam(p, m, v, g):
    b1, b2, eps, lr = 0.9, 0.999, 1e-8, 1e-3
    m2 = b1 * m + (1 - b1) * g
    v2 = b2 * v + (1 - b2) * g * g
    p2 = p - lr * (m2 / (1 - b1)) / (jnp.sqrt(v2 / (1 - b2)) + eps)
    return p2, m2, v2


print("XLA dense Adam (7 passes w/ grad read, 1.44 GB):",
      round(timeit(xla_adam, table, mu, nu, g_dense), 2), "ms", flush=True)

# ---- 3. real fused kernel (for the same-session reference) -------------------
N = 8192 * 16
flat_ids = rng.integers(0, 16 * 100_000, (N,), dtype=np.int64)
plan = jax.device_put(eg.make_sort_plan(flat_ids, V))
ids_dev = jnp.asarray(flat_ids, jnp.int32)
rows = jnp.asarray(rng.standard_normal((N, DIM)), jnp.float32)


@jax.jit
def real(plan, rows, table, mu, nu):
    istream = eg.stream_ids(plan, ids_dev, V)
    return fa.planned_adam_update(plan, istream, rows, table, mu, nu, hyper)


print("real fused kernel (incl. perm + chunks):",
      round(timeit(real, plan, rows, table, mu, nu), 2), "ms", flush=True)


# ---- 5. pure-stream, CONTIGUOUS [tile, D] blocks over row-major [V, D] -------
def big_rows():
    return pl.BlockSpec((TILE, DIM), lambda t, hyper: (t, 0),
                        memory_space=pltpu.VMEM)


grid_spec_rows = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1,
    grid=(T_TILES,),
    in_specs=[big_rows(), big_rows(), big_rows()],
    out_specs=[big_rows(), big_rows(), big_rows()],
    scratch_shapes=[],
)
shape_rows = jax.ShapeDtypeStruct((V, DIM), jnp.float32)


@jax.jit
def pure_stream_rows(table, mu, nu):
    return pl.pallas_call(
        _stream_kernel, grid_spec=grid_spec_rows, out_shape=[shape_rows] * 3,
        input_output_aliases={1: 0, 2: 1, 3: 2},
    )(hyper, table, mu, nu)


print("pure-stream pallas Adam, contiguous [tile, D] blocks:",
      round(timeit(pure_stream_rows, table, mu, nu), 2), "ms", flush=True)

# ---- 6. same but bigger tile (fewer grid steps, contiguous) -------------------
for T2 in (8192, 16384):
    def big2(_t=T2):
        return pl.BlockSpec((_t, DIM), lambda t, hyper: (t, 0),
                            memory_space=pltpu.VMEM)

    gs2 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(V // T2,),
        in_specs=[big2(), big2(), big2()], out_specs=[big2(), big2(), big2()],
        scratch_shapes=[])

    @jax.jit
    def ps2(table, mu, nu, _gs=gs2):
        return pl.pallas_call(
            _stream_kernel, grid_spec=_gs, out_shape=[shape_rows] * 3,
            input_output_aliases={1: 0, 2: 1, 3: 2},
        )(hyper, table, mu, nu)

    try:
        print(f"pure-stream contiguous, tile {T2}:",
              round(timeit(ps2, table, mu, nu), 2), "ms", flush=True)
    except Exception as e:
        print(f"tile {T2}: FAILED {str(e)[:120]}", flush=True)
