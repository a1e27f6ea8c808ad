"""Pallas TPU kernel: embedding-gradient accumulation (the scatter-add killer).

XLA lowers the backward of an embedding gather as row-serial scatter-add:
~137 ns per row on v5e (18 ms for 131k x 32f32 rows into a 1.6M-row table) —
the single hottest op in CTR training.  This kernel rebuilds the dense
gradient as a *sorted segment accumulation*:

  1. (XLA) argsort the flat ids; permute the cotangent rows (~3.5 ms).
  2. (XLA) searchsorted the sorted ids against tile boundaries -> ``starts``.
  3. (Pallas) grid over vocab tiles of R rows; each tile DMAs its contiguous
     window of sorted entries and accumulates them with a one-hot MXU matmul
     ``onehot(local_ids)^T @ rows`` — turning 131k serial RMWs into a few
     hundred [R x C] x [C x D] matmuls.

Because the ids are sorted, membership is decided purely by the id range of
the tile: DMA windows are 8-aligned and over-read on both sides, and entries
outside [t*R, (t+1)*R) simply match no one-hot column (sentinel padding rows
match nothing either), so no masks are needed.

``fused_gather(table, ids)`` wires this in as the custom VJP of jnp.take, so
embedding lookups get the fast backward transparently.  Numerics: the same
f32 terms as XLA's scatter, summed in a different order (matmul reduction).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_ROWS = 1024   # R: output rows per grid step (VMEM tile [R, D])
CHUNK = 128        # C: sorted entries DMA'd + matmul'd per inner iteration
# (R=1024/C=128 measured fastest on v5e across {512..4096}x{128..1024}: 14.7ms
# vs XLA scatter's 18.1ms for 131k x 32 f32 rows into 1.6M; HIGHEST precision
# because the default bf16 matmul pass rounds the cotangent rows)


def _accumulate_kernel(starts_ref, ids_ref, rows_ref, out_ref, *, dim):
    # ids_ref: [M, 128] i32 (flat order = row-major); rows_ref: [M*128, 128]
    # (rows lane-padded to 128 because manual DMA slices need 128-lane shapes)
    t = pl.program_id(0)
    out_ref[:] = jnp.zeros_like(out_ref)
    s = starts_ref[t]
    e = starts_ref[t + 1]
    # windows are 128-aligned so the ids chunk is whole [*, 128] rows
    s_aligned = (s // 128) * 128
    span = e - s_aligned
    row_base = t * TILE_ROWS
    sub = CHUNK // 128  # id rows per chunk

    def body(scratch_ids, scratch_rows, sem_i, sem_r):
        nchunks = pl.cdiv(span, CHUNK)

        def chunk_step(k, _):  # noqa: ANN001
            off = s_aligned + k * CHUNK  # arrays padded by CHUNK: over-read safe
            ci = pltpu.make_async_copy(ids_ref.at[pl.ds(off // 128, sub), :],
                                       scratch_ids, sem_i)
            cr = pltpu.make_async_copy(rows_ref.at[pl.ds(off, CHUNK), :],
                                       scratch_rows, sem_r)
            ci.start()
            cr.start()
            ci.wait()
            cr.wait()
            # ids outside [row_base, row_base + R) match no one-hot column:
            # sortedness makes the range check the complete membership filter
            for r in range(sub):
                local = scratch_ids[r, :] - row_base          # [128]
                onehot = (local[:, None] ==
                          jax.lax.broadcasted_iota(jnp.int32, (128, TILE_ROWS), 1)
                          ).astype(jnp.float32)               # [128, R]
                rows_r = scratch_rows[r * 128 : (r + 1) * 128, :]
                acc = jax.lax.dot_general(
                    onehot, rows_r,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # [R, 128]; only the first `dim` lanes are real
                out_ref[:] += acc[:, :dim]
            return 0

        jax.lax.fori_loop(0, nchunks, chunk_step, 0)

    pl.run_scoped(
        body,
        pltpu.VMEM((CHUNK // 128, 128), jnp.int32),
        pltpu.VMEM((CHUNK, 128), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit, static_argnums=(2,))
def sorted_segment_accumulate(flat_ids: jnp.ndarray, rows: jnp.ndarray,
                              num_rows: int) -> jnp.ndarray:
    """Dense [num_rows, D] gradient from (ids [N], cotangent rows [N, D])."""
    n, dim = rows.shape
    v_pad = ((num_rows + TILE_ROWS - 1) // TILE_ROWS) * TILE_ROWS
    t_tiles = v_pad // TILE_ROWS

    order = jnp.argsort(flat_ids)
    sorted_ids = jnp.take(flat_ids, order).astype(jnp.int32)
    sorted_rows = jnp.take(rows, order, axis=0)
    # pad to a CHUNK multiple plus one spare CHUNK so over-reads are safe;
    # sentinel ids match no tile
    n_pad = ((n + CHUNK - 1) // CHUNK + 1) * CHUNK
    sorted_ids_p = jnp.concatenate(
        [sorted_ids, jnp.full((n_pad - n,), v_pad + TILE_ROWS, jnp.int32)])
    sorted_rows_p = jnp.concatenate(
        [sorted_rows, jnp.zeros((n_pad - n, dim), sorted_rows.dtype)])
    # lane-pad to 128 so in-kernel DMA slices satisfy Mosaic's tiling rules
    sorted_rows_p = jnp.pad(sorted_rows_p, ((0, 0), (0, 128 - dim)))

    boundaries = jnp.arange(t_tiles + 1, dtype=jnp.int32) * TILE_ROWS
    starts = jnp.searchsorted(sorted_ids, boundaries).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # sorted ids [M, 128] in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # sorted rows [M*128, D] in HBM
        ],
        out_specs=pl.BlockSpec((TILE_ROWS, dim), lambda t, starts: (t, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_accumulate_kernel, dim=dim),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((v_pad, dim), jnp.float32),
    )(starts, sorted_ids_p.reshape(-1, 128), sorted_rows_p)
    return out[:num_rows]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _kernel_gather(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(table, ids, axis=0)


def _kernel_gather_fwd(table, ids):
    return jnp.take(table, ids, axis=0), (ids, table.shape[0])


def _kernel_gather_bwd(res, g):
    ids, num_rows = res
    flat_ids = ids.reshape(-1)
    rows = g.reshape(-1, g.shape[-1]).astype(jnp.float32)
    grad = sorted_segment_accumulate(flat_ids, rows, num_rows)
    return grad.astype(g.dtype), None


_kernel_gather.defvjp(_kernel_gather_fwd, _kernel_gather_bwd)

# thresholds: the kernel only pays off for big tables with many lookups
_MIN_TABLE_ROWS = 64 * 1024
_MIN_LOOKUPS = 8 * 1024


def _kernel_enabled() -> bool:
    # Isolated, the kernel beats XLA's scatter (14.7ms vs 18.1ms for the
    # 131k x 32 / 1.6M-row benchmark shape), but inside a full jitted train
    # step the integration overheads (lane-padding copies, serial argsort,
    # loss of overlap with the optimizer update) make the end-to-end step
    # slower (31.8ms vs 25.0ms measured on v5e).  Off by default until the
    # prep is fused into the kernel; flip on with REC_PANGU_TPU_FAST_SCATTER=1.
    import os

    return os.environ.get("REC_PANGU_TPU_FAST_SCATTER", "0") in ("1", "on", "true")


def fused_gather(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Embedding gather whose backward uses the Pallas sorted-segment
    accumulator on TPU for large tables; plain jnp.take otherwise."""
    if (table.ndim == 2 and table.shape[0] >= _MIN_TABLE_ROWS
            and ids.size >= _MIN_LOOKUPS and _kernel_enabled()):
        return _kernel_gather(table, ids)
    return jnp.take(table, ids, axis=0)
