"""Pallas TPU kernel: embedding Adam update fused into the planned backward.

The planned embedding backward (``embedding_grad.presorted_segment_accumulate``)
already holds each vocab tile's dense gradient in VMEM while it accumulates
the tile's chunks.  The separate optimizer pass then re-reads that gradient
plus the table and both Adam moments from HBM and writes three arrays back —
for a 1.6M x 32 table that is 8 full-table HBM passes per step
(grad write+read, p/m/v read+write), ~3.5 ms of the 8.1 ms DeepFM step
(docs/perf_notes.md §1).

This kernel applies the Adam update *inside* the gradient accumulation: the
dense gradient never reaches HBM and the traffic drops to the irreducible 6
passes (read+write of p/m/nu), overlapped with the one-hot MXU matmuls.

Kernel structure (the scalar-indexed variant was 2.3 ms slower — Mosaic only
auto-pipelines block fetches whose index maps it can look ahead through, so
heavy INPUT blocks keyed on a prefetched scalar stall per tile):

* grid over vocab TILES; p/m/v in/out blocks are indexed affinely by the tile
  id, so Mosaic double-buffers all six heavy streams at full bandwidth;
* each tile's (variable-length) run of 128-entry chunks — located by the
  plan's ``tile_starts`` — is fetched by a manual NBUF-deep async-copy ring
  from HBM and accumulated with one-hot MXU matmuls into a VMEM scratch tile;
* on the last chunk the resident p/m/v blocks are combined with the
  accumulated gradient by dense-semantics Adam and streamed to FRESH output
  buffers — in-place aliasing serializes Mosaic's write-back against the
  input fetches (see the note at the pallas_call below).

Semantics are DENSE Adam (optax.adam parity): every tile is visited every
step, so rows absent from the batch still have their moments decayed and
their parameters nudged by the bias-corrected first moment — comparable to
the reference's ``torch.optim.Adam`` over dense ``nn.Embedding`` grads
(rec_pangu/trainer.py:75).

Wired in by ``train/fused_update.py``; numerics A/B'd against the unfused
planned step in ``tests/test_fused_adam.py``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .embedding_grad import (CHUNK, _grad_mode, _plan_tile, _tile_rows,
                             plan_chunks_for_tile)

NBUF = 8  # chunk-fetch ring depth (the ring is global over the stream)
_VMEM_BUDGET = 10 * 1024 * 1024  # six double-buffered [D, R] blocks must fit


def _adam_tile_kernel(starts_ref, hyper_ref, ids_hbm, rows_hbm, p_ref, m_ref,
                      v_ref, *rest, dim, tile_rows, mode, t_tiles,
                      has_dense=False):
    if has_dense:
        # an extra affine-indexed [D, tile] dense-gradient block (e.g. the
        # streaming softmax-CE's d_items — train/fused_update.py seq path)
        (g_ref, p_out, m_out, v_out, acc_ref, ids_buf, rows_buf,
         qn_ref, sem_i, sem_r) = rest
    else:
        (p_out, m_out, v_out, acc_ref, ids_buf, rows_buf,
         qn_ref, sem_i, sem_r) = rest
        g_ref = None
    t = pl.program_id(0)
    c0 = starts_ref[t]
    c1 = starts_ref[t + 1]
    used = starts_ref[t_tiles]  # real (non-padding) chunks in the stream
    row_base = t * tile_rows

    def dma_pair(q, slot):
        # rows arrive TRANSPOSED [D, K*128]: the chunk slice (D, 128) is
        # 128-lane aligned (manual DMA requires it) and is directly the
        # matmul lhs — no in-kernel repack
        return (
            pltpu.make_async_copy(ids_hbm.at[pl.ds(q, 1), :],
                                  ids_buf.at[pl.ds(slot, 1), :],
                                  sem_i.at[slot]),
            pltpu.make_async_copy(rows_hbm.at[:, pl.ds(q * CHUNK, CHUNK)],
                                  rows_buf.at[slot], sem_r.at[slot]),
        )

    def issue(q):
        di, dr = dma_pair(q, jax.lax.rem(q, NBUF))
        di.start()
        dr.start()

    # the fetch ring is GLOBAL over the chunk stream, carried across grid
    # steps in qn_ref (scratch persists): most tiles have ~1 chunk, so a
    # per-tile ring would re-pay the HBM latency every grid step.  Invariant:
    # qn - consumed == min(NBUF - 1, used - consumed): keeping one slot idle
    # means a refill always targets the slot consumed LAST iteration — the
    # scalar core issues DMAs ahead of the VPU, so refilling the slot read in
    # the SAME iteration would race the reads.
    @pl.when(t == 0)
    def _warm():
        n0 = jnp.minimum(NBUF - 1, used)

        def warm(q, _):
            issue(q)
            return 0

        jax.lax.fori_loop(0, n0, warm, 0)
        qn_ref[0] = n0

    acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(c, _):
        slot = jax.lax.rem(c, NBUF)
        di, dr = dma_pair(c, slot)
        di.wait()
        dr.wait()
        local = ids_buf[slot, :] - row_base             # [128]
        onehot = (local[:, None] ==
                  jax.lax.broadcasted_iota(jnp.int32, (CHUNK, tile_rows), 1)
                  ).astype(jnp.float32)                 # [128, R]
        rows_r = rows_buf[slot]                         # [D, 128]

        def dot_t(lhs, precision):
            # transposed accumulation [D, R] = rows^T @ onehot (the layout
            # matches the tables' column-major storage — see embedding_grad)
            return jax.lax.dot_general(
                lhs, onehot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )

        if mode == "split2":
            hi = rows_r.astype(jnp.bfloat16).astype(jnp.float32)
            lo = rows_r - hi
            acc = (dot_t(hi, jax.lax.Precision.DEFAULT)
                   + dot_t(lo, jax.lax.Precision.DEFAULT))
        elif mode == "default":
            acc = dot_t(rows_r, jax.lax.Precision.DEFAULT)
        else:
            acc = dot_t(rows_r, jax.lax.Precision.HIGHEST)
        acc_ref[:] += acc
        # slot freed — refill with the next unissued chunk (if any); this
        # runs after the reads above, so the overwrite is safe
        qn = qn_ref[0]

        @pl.when(qn < used)
        def _refill():
            issue(qn)

        qn_ref[0] = qn + jnp.where(qn < used, 1, 0)
        return 0

    jax.lax.fori_loop(c0, c1, body, 0)

    g = acc_ref[:, :]
    if g_ref is not None:
        g = g + g_ref[:, :]
    lr = hyper_ref[0]
    b1 = hyper_ref[1]
    b2 = hyper_ref[2]
    eps = hyper_ref[3]
    inv_b1c = hyper_ref[4]  # 1 / (1 - b1**t)
    inv_b2c = hyper_ref[5]  # 1 / (1 - b2**t)
    # moments may be STORED bf16 (REC_PANGU_TPU_MOMENT_DTYPE=bf16 — halves
    # the m/v HBM streams, the binding cost of this roofline-bound pass);
    # all arithmetic stays f32
    mu = b1 * m_ref[:, :].astype(jnp.float32) + (1.0 - b1) * g
    nu = b2 * v_ref[:, :].astype(jnp.float32) + (1.0 - b2) * (g * g)
    m_out[:] = mu.astype(m_out.dtype)
    v_out[:] = nu.astype(v_out.dtype)
    # optax.scale_by_adam ordering: mu_hat / (sqrt(nu_hat) + eps)
    p_out[:] = p_ref[:, :] - lr * (mu * inv_b1c) / (
        jnp.sqrt(nu * inv_b2c) + eps)


def fused_adam_fits(num_rows: int, dim: int, has_dense: bool = False,
                    plan=None) -> bool:
    """Six (seven with a dense-grad stream) double-buffered [dim, tile] f32
    blocks must fit VMEM.  Pass the ``plan`` the update will actually run
    with: the kernel runs at the PLAN's tile (``_plan_tile``), which for a
    table of a different dim than the plan was built for can exceed this
    dim's own default tile (e.g. a D=64 table riding a D=32 plan's 4096
    tile needs 12*64*4096*4 ≈ 12.6 MB)."""
    tile = _plan_tile(plan, num_rows, dim) if plan is not None \
        else _tile_rows(num_rows, dim)
    return (14 if has_dense else 12) * dim * tile * 4 <= _VMEM_BUDGET


def planned_adam_update(plan, ids_stream, rows, table, mu, nu, hyper,
                        dense_grad_t=None, interpret: bool = False):
    """One dense-semantics Adam step on a planned embedding table.

    Args:
      plan: host sort plan for this batch's flat ids, with ``tile_starts``
        (``make_sort_plan(ids, table.shape[0])``).
      ids_stream: ``stream_ids(plan, flat_ids, table.shape[0])`` — [K, 128].
      rows: [N, D] f32 cotangent d(loss)/d(gathered rows), batch order.
      table, mu, nu: [V_pad, D] current param and Adam moments
        (V_pad a tile multiple — ``padded_rows``).  ``mu``/``nu`` may be
        bf16 (their storage dtype is preserved in the outputs; the Adam
        math runs f32 in-kernel) — see ``fused_update._moment_dtype``.
      hyper: f32[8] = [lr_t, b1, b2, eps, 1/(1-b1^t), 1/(1-b2^t), 0, 0].
      dense_grad_t: optional [D, V_pad] dense gradient (e.g. the streaming
        softmax-CE's transposed d_items) added tile-wise to the accumulated
        sparse gradient before the Adam math — replaces a separate
        full-table add + optimizer pass.

    Returns (new_table, new_mu, new_nu) as FRESH buffers — callers should
    NOT donate them: donation forces XLA to copy the kernel's outputs back
    into the donated table buffers, and in-place writes via
    input_output_aliases serialize Mosaic's write-back against the input
    fetches (measured 4.6 vs 2.8 ms for the 6-pass stream — see
    make_fused_update_train_step).
    """
    from .embedding_grad import _interpret

    interpret = interpret or _interpret()
    n, dim = rows.shape
    num_rows = table.shape[0]
    tile = _plan_tile(plan, num_rows, dim)
    if num_rows % tile:
        raise ValueError(
            f"fused Adam needs a tile-padded table; got {num_rows} rows "
            f"(pad with padded_rows)")
    t_tiles = num_rows // tile
    if "tile_starts" not in plan:
        raise ValueError("plan lacks tile_starts — rebuild with make_sort_plan")
    if plan["tile_starts"].shape[0] != t_tiles + 1:
        raise ValueError(
            f"sort plan was built for a different table: tile_starts has "
            f"{plan['tile_starts'].shape[0]} entries, expected {t_tiles + 1} "
            f"(= {num_rows} rows / tile {tile} + 1)")
    k_chunks = plan["meta"].shape[0]
    expected = plan_chunks_for_tile(n, num_rows, tile)
    if k_chunks != expected:
        raise ValueError(
            f"sort plan was built for a different table/batch: {k_chunks} "
            f"chunks, expected {expected} for {n} lookups into {num_rows} rows")
    # stream shipped dim-major so the kernel's manual chunk DMA slices are
    # 128-lane aligned; padding slots (perm -1 -> clamp to 0) carry row 0,
    # whose sentinel ids match no one-hot column
    sorted_rows_t = jnp.take(rows.astype(jnp.float32).T, plan["perm"], axis=1)

    def big(io):  # affine tile-indexed heavy streams — Mosaic auto-pipelines
        return pl.BlockSpec((dim, tile), lambda t, starts, hyper: (0, t),
                            memory_space=pltpu.VMEM)

    has_dense = dense_grad_t is not None
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # ids stream [K, 128], HBM
        pl.BlockSpec(memory_space=pl.ANY),  # rows^T [D, K*128], HBM
        big("in"), big("in"), big("in"),
    ]
    operands = [plan["tile_starts"], hyper, ids_stream, sorted_rows_t,
                table.T, mu.T, nu.T]
    if has_dense:
        if dense_grad_t.shape != (dim, num_rows):
            raise ValueError(
                f"dense_grad_t must be [D, V_pad] = {(dim, num_rows)}; got "
                f"{dense_grad_t.shape}")
        in_specs.append(big("in"))
        operands.append(dense_grad_t)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # tile_starts, hyper
        grid=(t_tiles,),
        in_specs=in_specs,
        out_specs=[big("out"), big("out"), big("out")],
        scratch_shapes=[
            pltpu.VMEM((dim, tile), jnp.float32),    # grad accumulator
            pltpu.VMEM((NBUF, CHUNK), jnp.int32),    # ids ring
            pltpu.VMEM((NBUF, dim, CHUNK), jnp.float32),  # rows^T ring
            pltpu.SMEM((1,), jnp.int32),             # next-chunk-to-issue
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    shape = jax.ShapeDtypeStruct((dim, num_rows), jnp.float32)
    m_shape = jax.ShapeDtypeStruct((dim, num_rows), mu.dtype)
    v_shape = jax.ShapeDtypeStruct((dim, num_rows), nu.dtype)
    # NO input_output_aliases: Mosaic serializes the output write-back with
    # the input fetches when a block streams in-place to the same HBM region
    # (measured 4.6 ms aliased vs 2.8 ms fresh-output for the 6-pass stream —
    # scripts/exp_stream_sweep.py).  Fresh outputs cost a transient 3x[V,D]
    # (615 MB at the bench shape) and run at the XLA elementwise rate; the
    # donated old buffers are recycled by the allocator on the next step.
    new_p, new_m, new_v = pl.pallas_call(
        functools.partial(_adam_tile_kernel, dim=dim, tile_rows=tile,
                          mode=_grad_mode(), t_tiles=t_tiles,
                          has_dense=has_dense),
        grid_spec=grid_spec,
        out_shape=[shape, m_shape, v_shape],
        interpret=interpret,
    )(*operands)
    # .T back into [V, D]: a layout bitcast of the column-major storage
    return new_p.T, new_m.T, new_v.T


def planned_adam_update_mesh(plan, ids_stream, rows, table, mu, nu, hyper,
                             mesh, rows_sharded: bool, dense_grad_t=None):
    """``planned_adam_update`` under a data-parallel mesh.

    The DP gradient exchange for a sparse table is done by all_gathering the
    per-shard cotangent ROWS (N x D — e.g. 16 MB at the bench shape) instead
    of psumming a dense [V, D] gradient (2 x 205 MB): ``plan`` must be the
    GLOBAL sort plan (the shard row blocks are contiguous, so the all_gather
    concatenation is exactly the global batch order), and every chip then
    runs the identical fused grad+Adam pass on its replicated table — the
    update work does not scale with the mesh, but it is HBM-roofline-bound
    at one table pass, the same floor a single chip has.

    ``rows_sharded=False`` handles replicated partial batches (every chip
    already holds all rows; no gather).  ``dense_grad_t``, when present, is
    replicated/psum'd by GSPMD before entering the region."""
    from jax.sharding import PartitionSpec as P

    from ...parallel.mesh import DATA_AXIS

    def _local(plan, ids_stream, rows, table, mu, nu, hyper, *rest):
        if rows_sharded:
            rows_all = jax.lax.all_gather(rows, DATA_AXIS, axis=0, tiled=True)
        else:
            rows_all = rows
        dg = rest[0] if rest else None
        return planned_adam_update(plan, ids_stream, rows_all, table, mu, nu,
                                   hyper, dense_grad_t=dg)

    args = (plan, ids_stream, rows, table, mu, nu, hyper)
    in_specs = (P(), P(), P(DATA_AXIS) if rows_sharded else P(),
                P(), P(), P(), P())
    if dense_grad_t is not None:
        args += (dense_grad_t,)
        in_specs += (P(),)
    return jax.shard_map(_local, mesh=mesh, in_specs=in_specs,
                         out_specs=(P(), P(), P()), check_vma=False)(*args)


def adam_hyper(step, lr, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-8) -> jnp.ndarray:
    """f32[8] hyper vector for ``planned_adam_update`` at 1-based step t."""
    t = step.astype(jnp.float32)
    b1c = 1.0 - jnp.float32(b1) ** t
    b2c = 1.0 - jnp.float32(b2) ** t
    return jnp.stack([
        jnp.asarray(lr, jnp.float32), jnp.float32(b1), jnp.float32(b2),
        jnp.float32(eps), 1.0 / b1c, 1.0 / b2c,
        jnp.float32(0.0), jnp.float32(0.0),
    ])
