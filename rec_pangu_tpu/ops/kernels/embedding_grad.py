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


def _interpret() -> bool:
    """Run the Pallas kernels in interpret mode (pure-JAX emulation) so the
    planned path is exercisable on CPU — used by the mesh parity tests.
    Enable with REC_PANGU_TPU_PALLAS_INTERPRET=1; never set it on real TPU."""
    import os

    return os.environ.get("REC_PANGU_TPU_PALLAS_INTERPRET", "0") in (
        "1", "on", "true")


def _grad_mode() -> str:
    """MXU precision mode for the one-hot accumulation.  The one-hot factor
    is exactly 0/1, so precision only affects how the cotangent rows are fed
    to the MXU (Mosaic supports only 1-pass DEFAULT and 6-pass HIGHEST):

      split2  — two DEFAULT passes over an error-compensated bf16 hi/lo split
                of the rows (~1e-5 rel vs f32 scatter, ~2x HIGHEST speed) [default]
      default — single bf16 pass (~1e-3 rel, fastest)
      highest — 6-pass (~1e-8 rel, matches f32 scatter numerics)

    Override: REC_PANGU_TPU_EMB_GRAD_PRECISION=split2|default|highest."""
    import os

    mode = os.environ.get("REC_PANGU_TPU_EMB_GRAD_PRECISION", "split2").lower()
    return mode if mode in ("split2", "default", "highest") else "split2"


def _accumulate_kernel(starts_ref, ids_ref, rows_ref, out_ref, *, dim,
                       tile_rows, mode):
    # ids_ref: [M, 128] i32 (flat order = row-major); rows_ref: [M*128, 128]
    # (rows lane-padded to 128 because manual DMA slices need 128-lane shapes)
    t = pl.program_id(0)
    out_ref[:] = jnp.zeros_like(out_ref)
    s = starts_ref[t]
    e = starts_ref[t + 1]
    # windows are 128-aligned so the ids chunk is whole [*, 128] rows
    s_aligned = (s // 128) * 128
    span = e - s_aligned
    row_base = t * tile_rows
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
                          jax.lax.broadcasted_iota(jnp.int32, (128, tile_rows), 1)
                          ).astype(jnp.float32)               # [128, R]
                rows_r = scratch_rows[r * 128 : (r + 1) * 128, :]

                # transposed accumulation [D, R]: rows^T @ onehot.  The grad
                # is emitted dim-major so the caller's .T is a layout BITCAST
                # into the {0,1}(column-major) layout XLA picks for embedding
                # tables — otherwise the Adam update pays 6 full-table layout
                # copies (~9 ms/step at 1.6M x 32, see docs/perf_notes.md).
                def dot_t(lhs, precision):
                    return jax.lax.dot_general(
                        lhs, onehot,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    )  # [128, R]; only the first `dim` sublanes are real

                if mode == "split2":
                    hi = rows_r.astype(jnp.bfloat16).astype(jnp.float32)
                    lo = rows_r - hi
                    acc = (dot_t(hi, jax.lax.Precision.DEFAULT)
                           + dot_t(lo, jax.lax.Precision.DEFAULT))
                elif mode == "default":
                    acc = dot_t(rows_r, jax.lax.Precision.DEFAULT)
                else:
                    acc = dot_t(rows_r, jax.lax.Precision.HIGHEST)
                out_ref[:] += acc[:dim, :]  # rows here are lane-padded to 128
            return 0

        jax.lax.fori_loop(0, nchunks, chunk_step, 0)

    pl.run_scoped(
        body,
        pltpu.VMEM((CHUNK // 128, 128), jnp.int32),
        pltpu.VMEM((CHUNK, 128), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA(()),
    )


_TILE_VMEM_BUDGET = 10 * 1024 * 1024  # sizes the fused kernel's 14 blocks


def _tile_rows(num_rows: int, dim: int = 32) -> int:
    """Largest vocab tile that (a) divides the table exactly — so the kernel
    writes the gradient at its final shape with no [:num_rows] slice
    (``padded_rows`` guarantees a divisor exists for big tables) — and
    (b) keeps the fused-Adam kernel's worst case (14 double-buffered
    [dim, tile] f32 blocks) inside the VMEM budget.

    Bigger tiles cut the plan's per-tile chunk padding (each tile's entries
    round up to 128-slot chunks: at the bench shape tile 2048 wastes 44% of
    the stream slots, tile 4096 only 15%) — every chunk-proportional cost
    (both permutes, the ids stream, the chunk loops) shrinks with it.
    Measured DeepFM bench step: 6.6 ms @ 2048 -> 5.4 ms @ 4096.  The cap is
    dim-aware so D=64 sequence tables stay at 2048 and D=128 at 1024 (where
    the previous fixed 2048 blew the budget and silently disabled fusion).
    """
    cap = _TILE_VMEM_BUDGET // (14 * max(dim, 1) * 4)
    t = 4096
    while t > 128 and (t > cap or num_rows % t):
        t //= 2
    return t


def _plan_tile(plan, num_rows: int, dim: int) -> int:
    """Tile size a plan was BUILT with, derived from its ``tile_starts``
    length — the plan is self-describing, so consumers can never disagree
    with the host builder (tables of different dims share one plan: e.g.
    WDL's [V, 1] wide table rides the D=32 plan).  Falls back to the
    dim-sized default for plans without tile_starts."""
    ts = plan.get("tile_starts") if isinstance(plan, dict) else None
    if ts is not None:
        t_tiles = ts.shape[-1] - 1
        if t_tiles > 0 and num_rows % t_tiles == 0:
            tile = num_rows // t_tiles
            # Accept the inference only when it is a tile the builder could
            # actually have used (power-of-two in [128, 4096] dividing
            # num_rows); e.g. a 1000-row table against a 128-tile plan would
            # otherwise infer tile=125 and misplace every row_base.
            if 128 <= tile <= 4096 and (tile & (tile - 1)) == 0:
                return tile
        raise ValueError(
            f"plan tile_starts length {t_tiles + 1} is inconsistent with "
            f"num_rows={num_rows}: no valid power-of-two tile in [128, 4096] "
            f"matches — the plan was built for a different table")
    return _tile_rows(num_rows, dim)


def plan_chunks_for_tile(num_lookups: int, num_rows: int, tile: int) -> int:
    """plan_chunks for an explicit tile size (see ``_plan_tile``)."""
    t_tiles = (-(-num_rows // tile) * tile) // tile
    k = t_tiles + num_lookups // CHUNK + 1
    return -(-k // 8) * 8  # ids are fetched in (8, 128) blocks


def padded_rows(total_rows: int) -> int:
    """Param-table row count: big tables are padded to an 8192 multiple so
    (a) the planned backward writes the grad at its final shape with no
    [:num_rows] slice and (b) the streaming softmax-CE (ops/softmax_ce.py)
    can chunk the raw table with zero pad/slice copies; the pad rows are
    never indexed (grad stays 0, Adam leaves them at init)."""
    if total_rows >= _MIN_TABLE_ROWS:
        return -(-total_rows // 8192) * 8192
    return total_rows


def _call_accumulate(starts, sorted_ids_p, sorted_rows_p, num_rows: int,
                     dim: int, mode: str = "highest") -> jnp.ndarray:
    """Launch the tile-accumulate grid over presorted, padded inputs."""
    tile = _tile_rows(num_rows, dim)
    v_pad = ((num_rows + tile - 1) // tile) * tile
    t_tiles = v_pad // tile
    if starts.shape[0] != t_tiles + 1:
        raise ValueError(
            f"sort plan was built for a different table: starts has "
            f"{starts.shape[0]} entries, expected {t_tiles + 1} "
            f"(= {num_rows} rows / tile {tile} + 1); rebuild the plan with "
            f"make_sort_plan(ids, padded_rows(total_rows))")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # sorted ids [M, 128] in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # sorted rows [M*128, 128] in HBM
        ],
        out_specs=pl.BlockSpec((dim, tile), lambda t, starts: (0, t),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_accumulate_kernel, dim=dim, tile_rows=tile,
                          mode=mode),
        grid_spec=grid_spec,
        interpret=_interpret(),
        out_shape=jax.ShapeDtypeStruct((dim, v_pad), jnp.float32),
    )(starts, sorted_ids_p, sorted_rows_p)
    out = out.T  # layout bitcast, not a copy (see kernel comment)
    return out if v_pad == num_rows else out[:num_rows]


@functools.partial(jax.jit, static_argnums=(2,))
def sorted_segment_accumulate(flat_ids: jnp.ndarray, rows: jnp.ndarray,
                              num_rows: int) -> jnp.ndarray:
    """Dense [num_rows, D] gradient from (ids [N], cotangent rows [N, D])."""
    n, dim = rows.shape
    tile = _tile_rows(num_rows, dim)
    v_pad = ((num_rows + tile - 1) // tile) * tile
    t_tiles = v_pad // tile

    order = jnp.argsort(flat_ids)
    sorted_ids = jnp.take(flat_ids, order).astype(jnp.int32)
    sorted_rows = jnp.take(rows, order, axis=0)
    # pad to a CHUNK multiple plus one spare CHUNK so over-reads are safe;
    # sentinel ids match no tile
    n_pad = ((n + CHUNK - 1) // CHUNK + 1) * CHUNK
    sorted_ids_p = jnp.concatenate(
        [sorted_ids, jnp.full((n_pad - n,), v_pad + tile, jnp.int32)])
    sorted_rows_p = jnp.concatenate(
        [sorted_rows, jnp.zeros((n_pad - n, dim), sorted_rows.dtype)])
    # lane-pad to 128 so in-kernel DMA slices satisfy Mosaic's tiling rules
    sorted_rows_p = jnp.pad(sorted_rows_p, ((0, 0), (0, 128 - dim)))

    boundaries = jnp.arange(t_tiles + 1, dtype=jnp.int32) * tile
    starts = jnp.searchsorted(sorted_ids, boundaries).astype(jnp.int32)
    return _call_accumulate(starts, sorted_ids_p.reshape(-1, 128),
                            sorted_rows_p, num_rows, dim)


# ---------------------------------------------------------------------------
# Host-planned path: the argsort/searchsorted prep above is what made the
# kernel a net loss inside a full train step (see docs/perf_notes.md §1).
# ``make_sort_plan`` moves that prep to the HOST at batch-build time — the
# idiomatic TPU embedding input pipeline (CSR-style preprocessed lookups, as
# SparseCore feeding does) — so the device backward is one [N,D] permute-
# gather plus dense per-tile MXU matmuls.  Measured on v5e (exp_planned_grad):
# DeepFM-shaped step 25.9 ms planned vs 30.7 ms XLA scatter at identical f32
# numerics (max rel grad err 6e-8).
# ---------------------------------------------------------------------------

def plan_chunks(num_lookups: int, num_rows: int, dim: int = 32) -> int:
    """Static chunk count of a sort plan: one per vocab tile (so every output
    tile is zero-initialized) plus the entries' own chunks plus one spare."""
    return plan_chunks_for_tile(num_lookups, num_rows,
                                _tile_rows(num_rows, dim))


def make_sort_plan(flat_ids, num_rows: int, compact: bool = False,
                   dim: int = 32):
    """Host-side (numpy) sort plan for a batch of fused embedding ids.

    Entries are argsorted and laid out as a stream of 128-entry CHUNKS, padded
    at vocab-tile boundaries so no chunk straddles two tiles — the kernel can
    then be a plain Mosaic-pipelined grid over chunks (auto double-buffered
    input fetches, output tile kept in VMEM across its consecutive chunks).

    Returns dict of numpy arrays to ship with the batch:
      meta       [K] i32 — per chunk: (output tile index << 2) | (first << 1)
                  | real.  ``first`` marks the tile's first chunk (kernel
                  zero-initializes the tile); ``real`` gates the matmul so the
                  all-sentinel padding chunks cost nothing.
      sorted_ids [K, 128] i32 — per-slot ids (sentinel in padding slots).
                  With ``compact=True`` this is omitted and the device
                  rebuilds it from perm (``stream_ids``) — a third less
                  host->device traffic at ~3 ms/step device cost (the rebuild
                  is a latency-bound 1-D gather); use it only when the
                  host->device link, not the chip, is the bottleneck.
      perm       [K*128] i32 — source index per slot; padding slots hold -1.
      inv_perm   [n] i32 — original position -> stream slot, for the
                  scan-select forward's un-permute.
    """
    import numpy as np

    flat_ids = np.asarray(flat_ids, dtype=np.int64).reshape(-1)
    n = flat_ids.shape[0]
    if n and (int(flat_ids.min()) < 0 or int(flat_ids.max()) >= num_rows):
        raise ValueError(
            f"id out of range for a {num_rows}-row table — build the plan "
            f"with padded_rows(total_rows)")
    K = plan_chunks(n, num_rows, dim)
    res = _subset_plan(flat_ids, np.arange(n, dtype=np.int64), num_rows, K,
                       dim=dim)
    assert res is not None  # K = plan_chunks(n) always fits n entries
    plan, slots = res
    plan["inv_perm"] = slots
    if compact:
        plan.pop("sorted_ids", None)
    return plan


def _subset_plan(rel_ids, positions, num_rows: int, k_chunks: int,
                 dim: int = 32):
    """Sort plan over a SUBSET of ids (already relative to a table shard)
    with a FIXED chunk capacity ``k_chunks``.  ``positions[i]`` is the index
    of subset entry i in the original flat id array — perm values are
    global, so the chunk kernels consume cotangent rows in original batch
    order unchanged.  Returns (plan, slots) where ``slots[i]`` is entry i's
    stream slot, or None when the subset overflows the capacity."""
    import ctypes

    import numpy as np

    rel = np.ascontiguousarray(rel_ids, dtype=np.int64).reshape(-1)
    positions = np.asarray(positions, dtype=np.int64).reshape(-1)
    n = rel.shape[0]
    tile = _tile_rows(num_rows, dim)
    v_pad = -(-num_rows // tile) * tile
    t_tiles = v_pad // tile

    from ...native.build import get_lib

    lib = get_lib()
    if (lib is not None and hasattr(lib, "build_sort_plan")
            and not (tile & (tile - 1))):
        meta = np.empty((k_chunks,), np.int32)
        ids_stream = np.empty((k_chunks * CHUNK,), np.int32)
        perm = np.empty((k_chunks * CHUNK,), np.int32)
        inv_perm = np.empty((max(n, 1),), np.int32)
        counts = np.empty((t_tiles,), np.int64)
        base = np.empty((t_tiles + 1,), np.int64)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        rc = lib.build_sort_plan(
            rel.ctypes.data_as(i64p), n, num_rows, tile, CHUNK, k_chunks,
            meta.ctypes.data_as(i32p), ids_stream.ctypes.data_as(i32p),
            perm.ctypes.data_as(i32p), inv_perm.ctypes.data_as(i32p),
            counts.ctypes.data_as(i64p), base.ctypes.data_as(i64p))
        if rc != 0:
            return None  # capacity overflow (range was pre-validated)
        mask = perm >= 0
        perm_g = np.full_like(perm, -1)
        perm_g[mask] = positions[perm[mask]]
        plan = {"meta": meta, "perm": perm_g,
                "tile_starts": base.astype(np.int32),
                "sorted_ids": ids_stream.reshape(k_chunks, CHUNK)}
        return plan, inv_perm[:n].copy()

    # numpy fallback (same layout; order within a tile is irrelevant)
    order = np.argsort(rel, kind="stable").astype(np.int64)
    sorted_ids = rel[order]
    starts = np.searchsorted(
        sorted_ids, np.arange(t_tiles + 1, dtype=np.int64) * tile)
    n_t = np.diff(starts)
    cpt = np.maximum(1, -(-n_t // CHUNK))
    base = np.concatenate([[0], np.cumsum(cpt)])
    used = int(base[-1])
    if used > k_chunks:
        return None
    perm_g = np.full((k_chunks * CHUNK,), -1, np.int32)
    slots = np.zeros((n,), np.int32)
    ids_stream = np.full((k_chunks * CHUNK,), v_pad + tile, np.int32)
    if n:
        tile_of = sorted_ids // tile
        rank = np.arange(n, dtype=np.int64) - starts[tile_of]
        dest = base[tile_of] * CHUNK + rank
        perm_g[dest] = positions[order]
        slots[order] = dest
        ids_stream[dest] = sorted_ids
    chunk_tile = np.full((k_chunks,), t_tiles - 1, np.int64)
    first = np.zeros((k_chunks,), np.int64)
    real = np.zeros((k_chunks,), np.int64)
    tile_per_chunk = np.repeat(np.arange(t_tiles, dtype=np.int64), cpt)
    chunk_tile[:used] = tile_per_chunk
    first[base[:-1]] = 1
    local_c = np.arange(used, dtype=np.int64) - base[tile_per_chunk]
    real[:used] = local_c * CHUNK < n_t[tile_per_chunk]
    meta = ((chunk_tile << 2) | (first << 1) | real).astype(np.int32)
    plan = {"meta": meta, "perm": perm_g,
            "tile_starts": base.astype(np.int32),
            "sorted_ids": ids_stream.reshape(k_chunks, CHUNK)}
    return plan, slots


def tp_capacity_chunks(num_lookups_local: int, shard_rows: int,
                       n_model: int, dim: int = 32) -> int:
    """Static per-shard chunk capacity for TP plans: room for
    ``capacity_slack`` times the balanced share of one data shard's lookups
    (REC_PANGU_TPU_TP_SLACK, default 2.0 — item popularity is skewed, so the
    hottest table shard routinely sees more than N/m ids)."""
    import math
    import os

    slack = float(os.environ.get("REC_PANGU_TPU_TP_SLACK", "2.0"))
    cap_n = min(num_lookups_local,
                int(math.ceil(num_lookups_local / n_model * slack)))
    return plan_chunks(cap_n, shard_rows, dim)


def make_tp_sort_plan(flat_ids, num_rows: int, n_model: int,
                      n_data: int = 1, dim: int = 32):
    """Host plans for the tensor-parallel (row-sharded table) lookup.

    For each (data shard i, model shard j): a capacity-bounded subset plan
    over i's ids owned by j (relative to j's row range).  Device (i, j)
    scan-selects its stream from its table shard; one all_gather over
    'model' reassembles, and ``inv_perm_global`` un-permutes.  Returns None
    when any bucket overflows the capacity (the caller falls back to the
    GSPMD gather for that batch) — with REC_PANGU_TPU_TP_SLACK=2.0 this is
    rare for hashed ids and possible for very skewed batches.

    Leaves: plan arrays [n_data, n_model, ...] + inv_perm_global
    [n_data, N/n_data]."""
    import numpy as np

    ids = np.asarray(flat_ids, dtype=np.int64).reshape(-1)
    n = ids.size
    if num_rows % n_model or n % max(n_data, 1):
        return None
    shard_rows = num_rows // n_model
    n_l = n // n_data
    if n and (ids.min() < 0 or ids.max() >= num_rows):
        raise ValueError(
            f"id out of range for a {num_rows}-row table — build the plan "
            f"with padded_rows(total_rows)")
    k_c = tp_capacity_chunks(n_l, shard_rows, n_model, dim)
    cap_slots = k_c * CHUNK
    per_ij = []
    inv_global = np.zeros((n_data, n_l), np.int32)
    for i in range(n_data):
        lo = ids[i * n_l:(i + 1) * n_l]
        owner = lo // shard_rows
        row = []
        for j in range(n_model):
            idx = np.nonzero(owner == j)[0]
            res = _subset_plan(lo[idx] - j * shard_rows, idx,
                               shard_rows, k_c, dim=dim)
            if res is None:
                return None  # bucket overflow -> caller falls back
            plan_j, slots = res
            inv_global[i, idx] = j * cap_slots + slots
            row.append(plan_j)
        per_ij.append(row)
    stacked = {
        k: np.stack([np.stack([per_ij[i][j][k] for j in range(n_model)])
                     for i in range(n_data)])
        for k in per_ij[0][0]
    }
    stacked["inv_perm_global"] = inv_global
    return stacked


def stream_ids(plan, flat_ids: jnp.ndarray, num_rows: int) -> jnp.ndarray:
    """[K, 128] per-slot ids: shipped with the plan by default; compact plans
    rebuild them on device (a latency-bound 1-D gather, ~3 ms at 131k ids —
    see make_sort_plan)."""
    if "sorted_ids" in plan:
        return plan["sorted_ids"]
    perm = plan["perm"]
    ids = jnp.take(flat_ids, perm, axis=0)  # -1 clips to 0; masked next
    # the sentinel only needs to land outside every tile's [base, base+tile)
    # range; num_rows + 8192 clears any tile size without knowing the tile
    ids = jnp.where(perm >= 0, ids, num_rows + 8192).astype(jnp.int32)
    return ids.reshape(-1, CHUNK)


def _chunk_kernel(meta_ref, ids_ref, rows_ref, out_ref, *, dim, tile_rows,
                  mode):
    """One grid step per 128-entry chunk; Mosaic pipelines the input fetches
    and keeps the output tile in VMEM across its consecutive chunks."""
    k = pl.program_id(0)
    m = meta_ref[k]
    row_base = (m >> 2) * tile_rows
    ids_row = k % 8  # ids arrive in (8, 128) blocks; pick this chunk's row

    @pl.when(((m >> 1) & 1) == 1)
    def _zero():  # first chunk of this output tile
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when((m & 1) == 1)
    def _acc():
        local = ids_ref[ids_row, :] - row_base        # [128]
        onehot = (local[:, None] ==
                  jax.lax.broadcasted_iota(jnp.int32, (CHUNK, tile_rows), 1)
                  ).astype(jnp.float32)               # [128, R]
        rows_r = rows_ref[:, :]                       # [128, D]

        # transposed accumulation [D, R] = rows^T @ onehot; see the layout
        # comment in _accumulate_kernel (the .T downstream is a bitcast)
        def dot_t(lhs, precision):
            return jax.lax.dot_general(
                lhs, onehot,
                dimension_numbers=(((0,), (0,)), ((), ())),
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
        out_ref[:] += acc  # already [D, R]: rows arrive at their true width


def presorted_segment_accumulate(plan, rows: jnp.ndarray,
                                 num_rows: int,
                                 ids_stream: jnp.ndarray,
                                 capacity_ok: bool = False) -> jnp.ndarray:
    """Dense [num_rows, D] grad from cotangent rows [N, D] + host sort plan.
    ``ids_stream`` is ``stream_ids(plan, flat_ids, num_rows)``.
    ``capacity_ok`` skips the chunk-count check for capacity-bounded plans
    (the TP subset plans), whose K is a capacity, not plan_chunks(N)."""
    n, dim = rows.shape
    tile = _plan_tile(plan, num_rows, dim)
    v_pad = -(-num_rows // tile) * tile
    k_chunks = plan["meta"].shape[0]
    expected = plan_chunks_for_tile(n, num_rows, tile)
    if k_chunks != expected and not capacity_ok:
        raise ValueError(
            f"sort plan was built for a different table/batch: {k_chunks} "
            f"chunks, expected {expected} for {n} lookups into {num_rows} "
            f"rows; rebuild with make_sort_plan(ids, padded_rows(total_rows))")
    # perm is padded: padding slots gather row 0, whose sentinel id matches no
    # one-hot column — so the padded gather needs no concatenation step.  The
    # rows block is (CHUNK, dim) — full-array minor dims need no lane pad.
    sorted_rows = jnp.take(rows, plan["perm"], axis=0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k_chunks,),
        in_specs=[
            pl.BlockSpec((8, CHUNK), lambda k, meta: (k // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, dim), lambda k, meta: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((dim, tile), lambda k, meta: (0, meta[k] >> 2),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_chunk_kernel, dim=dim, tile_rows=tile,
                          mode=_grad_mode()),
        grid_spec=grid_spec,
        interpret=_interpret(),
        out_shape=jax.ShapeDtypeStruct((dim, v_pad), jnp.float32),
    )(plan["meta"], ids_stream, sorted_rows)
    out = out.T  # layout bitcast into the tables' column-major layout
    return out if v_pad == num_rows else out[:num_rows]


def _select_tile_kernel(starts_ref, ids_hbm, table_ref, out_hbm,
                        sel_buf, ids_buf, qn_ref, sem_i, sem_o,
                        *, dim, tile_rows, mode, t_tiles):
    """Forward select, tile-grid variant: the table block is AFFINE-indexed
    by the grid step (Mosaic auto-pipelines the one heavy read stream at full
    bandwidth), each tile's chunks are walked with the same global NBUF-deep
    ids ring as the fused-Adam kernel, and the selected [128, D] rows are
    written to the HBM stream buffer by manual async copies.

    Replaces the chunk-grid ``_select_kernel``, whose table fetches were
    keyed on a prefetched scalar (``meta[k] >> 2``) — Mosaic cannot look
    ahead through scalar-keyed maps, so every tile paid the HBM latency
    serially: 1.53 ms for the 205 MB bench table (134 GB/s) vs ~0.5 ms here.
    """
    from .fused_adam import NBUF

    t = pl.program_id(0)
    c0 = starts_ref[t]
    c1 = starts_ref[t + 1]
    used = starts_ref[t_tiles]
    row_base = t * tile_rows

    def ids_copy(q, slot):
        return pltpu.make_async_copy(ids_hbm.at[pl.ds(q, 1), :],
                                     ids_buf.at[pl.ds(slot, 1), :],
                                     sem_i.at[slot])

    def out_copy(q, slot):
        # stream buffer is TRANSPOSED [D, K*128]: the minor slice is 128-lane
        # aligned (manual DMA requires it; a [128, D] slice is not at D<128)
        return pltpu.make_async_copy(
            sel_buf.at[slot],
            out_hbm.at[:, pl.ds(q * CHUNK, CHUNK)],
            sem_o.at[slot])

    @pl.when(t == 0)
    def _warm():
        n0 = jnp.minimum(NBUF - 1, used)

        def warm(q, _):
            ids_copy(q, q).start()  # slot == q while q < NBUF
            return 0

        jax.lax.fori_loop(0, n0, warm, 0)
        qn_ref[0] = n0

    def body(c, _):
        slot = jax.lax.rem(c, NBUF)
        ids_copy(c, slot).wait()
        local = ids_buf[slot, :] - row_base           # [128]
        onehot = (local[:, None] ==
                  jax.lax.broadcasted_iota(jnp.int32, (CHUNK, tile_rows), 1)
                  ).astype(jnp.float32)               # [128, R]

        def dot_s(rhs, precision):
            # rhs is the tile of the TRANSPOSED table [D, R] (a bitcast of
            # the column-major param): [D, 128] = rhs @ onehot^T — emitted
            # directly in the stream buffer's [D, slots] orientation
            return jax.lax.dot_general(
                rhs, onehot,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )

        tile_vals = table_ref[:, :]
        if mode == "split2":
            hi = tile_vals.astype(jnp.bfloat16).astype(jnp.float32)
            lo = tile_vals - hi
            acc = (dot_s(hi, jax.lax.Precision.DEFAULT)
                   + dot_s(lo, jax.lax.Precision.DEFAULT))
        elif mode == "default":
            acc = dot_s(tile_vals, jax.lax.Precision.DEFAULT)
        else:
            acc = dot_s(tile_vals, jax.lax.Precision.HIGHEST)
        # sentinel ids in padding slots match no one-hot column -> zeros,
        # so padding chunks need no gating (same rows as the zeroing kernel)

        @pl.when(c >= NBUF)
        def _wait_prev_out():  # this slot's previous output DMA, NBUF ago
            out_copy(c - NBUF, slot).wait()

        sel_buf[slot] = acc
        out_copy(c, slot).start()
        qn = qn_ref[0]

        @pl.when(qn < used)
        def _refill():
            ids_copy(qn, jax.lax.rem(qn, NBUF)).start()

        qn_ref[0] = qn + jnp.where(qn < used, 1, 0)
        return 0

    jax.lax.fori_loop(c0, c1, body, 0)

    @pl.when(t == t_tiles - 1)
    def _drain():  # the last NBUF output DMAs are still in flight
        def wait_out(q, _):
            out_copy(q, jax.lax.rem(q, NBUF)).wait()
            return 0

        jax.lax.fori_loop(jnp.maximum(used - NBUF, 0), used, wait_out, 0)


def _select_kernel(meta_ref, ids_ref, table_ref, out_ref, *, dim, tile_rows,
                   mode):
    """Forward: stream the table tile-sequentially and select each chunk's
    rows with a one-hot matmul — beats XLA's random row gather once lookups
    are dense enough that the gather's per-row latency exceeds a full scan.
    (Chunk-grid fallback for plans without ``tile_starts``; the tile-grid
    ``_select_tile_kernel`` above is the fast path.)"""
    k = pl.program_id(0)
    m = meta_ref[k]
    row_base = (m >> 2) * tile_rows
    ids_row = k % 8

    @pl.when((m & 1) == 1)
    def _sel():
        local = ids_ref[ids_row, :] - row_base        # [128]
        onehot = (local[:, None] ==
                  jax.lax.broadcasted_iota(jnp.int32, (CHUNK, tile_rows), 1)
                  ).astype(jnp.float32)               # [128, R]

        def dot_s(rhs, precision):
            # rhs is the tile of the TRANSPOSED table [D, R]: the param is
            # stored column-major (see the layout comment in _chunk_kernel),
            # so table.T is a bitcast and the kernel reads it copy-free
            return jax.lax.dot_general(
                rhs, onehot,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )  # [D, 128] — the stream buffer's orientation

        tile_vals = table_ref[:, :]
        if mode == "split2":
            hi = tile_vals.astype(jnp.bfloat16).astype(jnp.float32)
            lo = tile_vals - hi
            acc = (dot_s(hi, jax.lax.Precision.DEFAULT)
                   + dot_s(lo, jax.lax.Precision.DEFAULT))
        elif mode == "default":
            acc = dot_s(tile_vals, jax.lax.Precision.DEFAULT)
        else:
            acc = dot_s(tile_vals, jax.lax.Precision.HIGHEST)
        out_ref[:] = acc

    @pl.when((m & 1) == 0)
    def _pad():  # sentinel chunk: slots never read back, keep them defined
        out_ref[:] = jnp.zeros_like(out_ref)


# scan-select forward pays a full sequential table read + one matmul per
# chunk; the random gather pays ~35 ns/row (and grows with table size).
# Measured on v5e at 131k lookups / 1.6M rows (1/12 density): gather 4.6 ms,
# scan ~2.3 ms — gate at 1/24.
_SCAN_FWD_DENSITY = 24


def _select_stream(table, plan, ids_stream) -> jnp.ndarray:
    """The scan-select kernel's raw output: per-slot rows TRANSPOSED
    [D, K*128] in stream order (the [D, slots] orientation keeps every manual
    DMA slice 128-lane aligned; padding slots zero; slots past the plan's
    used chunk count are undefined — ``inv_perm`` never references them)."""
    from .fused_adam import NBUF

    num_rows, dim = table.shape
    tile = _plan_tile(plan, num_rows, dim)
    k_chunks = plan["meta"].shape[0]
    v_pad = -(-num_rows // tile) * tile
    t_tiles = v_pad // tile
    starts = plan.get("tile_starts")
    if starts is not None and starts.shape[0] == t_tiles + 1:
        # fast path: affine tile grid + manual ids ring / output DMAs
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(t_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # ids stream [K, 128], HBM
                pl.BlockSpec((dim, tile), lambda t, starts: (0, t),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),  # stream buf, HBM
            scratch_shapes=[
                pltpu.VMEM((NBUF, dim, CHUNK), jnp.float32),  # sel ring
                pltpu.VMEM((NBUF, CHUNK), jnp.int32),         # ids ring
                pltpu.SMEM((1,), jnp.int32),                  # next to issue
                pltpu.SemaphoreType.DMA((NBUF,)),
                pltpu.SemaphoreType.DMA((NBUF,)),
            ],
        )
        return pl.pallas_call(
            functools.partial(_select_tile_kernel, dim=dim, tile_rows=tile,
                              mode=_grad_mode(), t_tiles=t_tiles),
            grid_spec=grid_spec,
            interpret=_interpret(),
            out_shape=jax.ShapeDtypeStruct((dim, k_chunks * CHUNK),
                                           jnp.float32),
        )(starts, ids_stream, table.T)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k_chunks,),
        in_specs=[
            pl.BlockSpec((8, CHUNK), lambda k, meta: (k // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, tile), lambda k, meta: (0, meta[k] >> 2),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((dim, CHUNK), lambda k, meta: (0, k),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_select_kernel, dim=dim, tile_rows=tile,
                          mode=_grad_mode()),
        grid_spec=grid_spec,
        interpret=_interpret(),
        out_shape=jax.ShapeDtypeStruct((dim, k_chunks * CHUNK), jnp.float32),
    )(plan["meta"], ids_stream, table.T)


def _scan_select_forward(table, ids, plan, ids_stream):
    stream_t = _select_stream(table, plan, ids_stream)       # [D, K*128]
    flat_t = jnp.take(stream_t, plan["inv_perm"], axis=1)    # un-permute
    flat = flat_t.T  # [N, D]
    return flat.reshape(ids.shape + (table.shape[1],)).astype(table.dtype)


def _scan_fwd_ok(table, ids, plan) -> bool:
    import os

    if os.environ.get("REC_PANGU_TPU_PLANNED_FWD", "1") not in ("1", "on", "true"):
        return False
    return ("inv_perm" in plan
            and table.shape[1] >= 8  # sub-tile dims stay on the plain gather
            and ids.size * _SCAN_FWD_DENSITY >= table.shape[0])


def _planned_value(table, ids, plan, ids_stream=None):
    expected = plan_chunks_for_tile(
        ids.size, table.shape[0],
        _plan_tile(plan, table.shape[0], table.shape[1]))
    if plan["meta"].shape[0] != expected:
        raise ValueError(
            f"sort plan was built for a different table/batch: "
            f"{plan['meta'].shape[0]} chunks, expected {expected} for "
            f"{ids.size} lookups into {table.shape[0]} rows; rebuild with "
            f"make_sort_plan(ids, padded_rows(total_rows))")
    if _scan_fwd_ok(table, ids, plan):
        if ids_stream is None:
            ids_stream = stream_ids(plan, ids.reshape(-1), table.shape[0])
        return _scan_select_forward(table, ids, plan, ids_stream)
    return jnp.take(table, ids, axis=0)


@jax.custom_vjp
def planned_gather(table: jnp.ndarray, ids: jnp.ndarray, plan) -> jnp.ndarray:
    """jnp.take whose backward uses a host-computed sort plan (no scatter).

    ``plan`` MUST be ``make_sort_plan(ids.reshape(-1), table.shape[0])`` for
    exactly these ids — the trainer/bench attach it per batch.
    """
    return _planned_value(table, ids, plan)


def _planned_fwd(table, ids, plan):
    ids_stream = stream_ids(plan, ids.reshape(-1), table.shape[0])
    value = _planned_value(table, ids, plan, ids_stream)
    return value, (plan, ids_stream, table.shape[0])


def _planned_bwd(res, g):
    plan, ids_stream, num_rows = res
    rows = g.reshape(-1, g.shape[-1]).astype(jnp.float32)
    grad = presorted_segment_accumulate(plan, rows, num_rows, ids_stream)
    return grad.astype(g.dtype), None, None


planned_gather.defvjp(_planned_fwd, _planned_bwd)


# ---------------------------------------------------------------------------
# Tensor-parallel planned path (SURVEY.md §7.3 hard part #1): the table is
# ROW-SHARDED over the 'model' axis.  The host buckets each data shard's ids
# by owning table shard into capacity-bounded subset plans; device (i, j)
# scan-selects its stream [C, D] from its local rows, ONE all_gather over
# 'model' reassembles all streams, and a host-computed global inverse
# permutation restores batch order.  Backward: each table shard accumulates
# its own rows from the LOCAL cotangent with the chunk kernel (perm indexes
# the local batch), and shard_map's transpose adds the one psum over 'data'
# that DP requires — no collective touches anything table-sized.
# ---------------------------------------------------------------------------

def _tp_value(table_shard, ids, plan_ij, inv_i):
    import os

    from ...parallel.mesh import MODEL_AXIS

    shard_rows, dim = table_shard.shape
    ids_stream = plan_ij["sorted_ids"]  # TP plans always ship the stream
    # same gates as _scan_fwd_ok: the env escape hatch, sub-tile dims stay on
    # the plain gather, and the density threshold — stream slots are ~2x the
    # real per-shard entries (capacity slack), so halve the single-table gate
    scan_on = os.environ.get("REC_PANGU_TPU_PLANNED_FWD", "1") in (
        "1", "on", "true")
    if (scan_on and dim >= 8
            and ids_stream.size * (_SCAN_FWD_DENSITY // 2) >= shard_rows):
        stream_t = _select_stream(table_shard, plan_ij, ids_stream)
    else:
        # low density: per-slot gather (sentinel slots clip; never read back)
        stream_t = jnp.take(table_shard.T, ids_stream.reshape(-1), axis=1,
                            mode="clip").astype(jnp.float32)
    # stream is [D, slots]: gather over 'model' concatenates the slot axis
    all_stream = jax.lax.all_gather(stream_t, MODEL_AXIS, axis=1, tiled=True)
    flat = jnp.take(all_stream, inv_i, axis=1).T
    return flat.reshape(ids.shape + (dim,)).astype(table_shard.dtype)


def tp_plan_matches(plan, num_lookups: int, num_rows: int,
                    n_data: int, n_model: int, dim: int = 32) -> bool:
    """Shape check for a TP plan ([n_data, n_model, ...] leaves)."""
    if plan is None or "meta" not in plan or "inv_perm_global" not in plan:
        return False
    meta = plan["meta"]
    if getattr(meta, "ndim", 1) != 3 or num_lookups % max(n_data, 1):
        return False
    if num_rows % n_model:
        return False
    n_l = num_lookups // n_data
    k_c = tp_capacity_chunks(n_l, num_rows // n_model, n_model, dim)
    return (meta.shape == (n_data, n_model, k_c)
            and plan["perm"].shape == (n_data, n_model, k_c * CHUNK)
            and plan["inv_perm_global"].shape == (n_data, n_l))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _tp_gather_outer(mesh, table, ids, plans, inv):
    return _tp_gather_value(mesh, table, ids, plans, inv)


def _tp_gather_value(mesh, table, ids, plans, inv):
    from jax.sharding import PartitionSpec as P

    from ...parallel.mesh import DATA_AXIS, MODEL_AXIS

    def _local(table_shard, ids_l, plans_ij, inv_i):
        p = {k: v[0, 0] for k, v in plans_ij.items()}
        return _tp_value(table_shard, ids_l, p, inv_i[0])

    return jax.shard_map(
        _local, mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P(DATA_AXIS),
                  P(DATA_AXIS, MODEL_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS), check_vma=False,
    )(table, ids, plans, inv)


def _tp_gather_fwd(mesh, table, ids, plans, inv):
    from ...parallel.mesh import MODEL_AXIS

    value = _tp_gather_value(mesh, table, ids, plans, inv)
    return value, (plans, table.shape[0] // mesh.shape[MODEL_AXIS])


def _tp_gather_bwd(mesh, res, g):
    """The backward is its OWN shard_map region with explicit collectives —
    each table shard runs the chunk kernel on its data shard's cotangent
    rows, then one psum over 'data' makes the [R, D] shard grads exact and
    data-replicated, matching the out_spec.  No reliance on shard_map's
    transpose conventions for partially-mapped inputs."""
    from jax.sharding import PartitionSpec as P

    from ...parallel.mesh import DATA_AXIS, MODEL_AXIS

    plans, shard_rows = res

    def _local(g_i, plans_ij):
        p = {k: v[0, 0] for k, v in plans_ij.items()}
        rows = g_i.reshape(-1, g_i.shape[-1]).astype(jnp.float32)
        grad = presorted_segment_accumulate(p, rows, shard_rows,
                                            p["sorted_ids"],
                                            capacity_ok=True)
        return jax.lax.psum(grad, DATA_AXIS)

    grad = jax.shard_map(
        _local, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS, MODEL_AXIS)),
        out_specs=P(MODEL_AXIS, None), check_vma=False,
    )(g, plans)
    return grad.astype(g.dtype), None, None, None


_tp_gather_outer.defvjp(_tp_gather_fwd, _tp_gather_bwd)


def planned_gather_tp(table: jnp.ndarray, ids: jnp.ndarray, plan,
                      mesh) -> jnp.ndarray:
    """planned_gather for a table row-sharded over 'model' and a batch
    sharded over 'data'; ``plan`` from ``make_tp_sort_plan``."""
    inv = plan["inv_perm_global"]
    plans = {k: v for k, v in plan.items() if k != "inv_perm_global"}
    return _tp_gather_outer(mesh, table, ids, plans, inv)


def planned_path_ok(num_rows: int, num_lookups: int, dim: int) -> bool:
    """Trace-time gate for the host-planned backward: TPU backend, a table/
    batch big enough to beat XLA's scatter, and a kernel-friendly dim."""
    import os

    if os.environ.get("REC_PANGU_TPU_PLANNED_EMB", "1") not in ("1", "on", "true"):
        return False
    if jax.default_backend() == "cpu" and not _interpret():
        return False
    return (num_rows >= _MIN_TABLE_ROWS and num_lookups >= _MIN_LOOKUPS
            and dim <= 128 and (dim < 8 or dim % 8 == 0))


def plan_matches(plan, num_lookups: int, num_rows: int,
                 dim: int = 32) -> bool:
    """Shape-level consistency check (content is the caller's contract)."""
    if plan is None or "meta" not in plan:
        return False
    k = plan_chunks_for_tile(num_lookups, num_rows,
                             _plan_tile(plan, num_rows, dim))
    return (plan["meta"].shape == (k,)
            and plan["perm"].shape == (k * CHUNK,)
            and plan.get("inv_perm") is not None
            and plan["inv_perm"].shape == (num_lookups,))


# ---------------------------------------------------------------------------
# Data-parallel planned path (SURVEY.md §2.6): under a mesh the batch rows
# live on different chips, so ONE host plan cannot drive the kernels.  The
# host instead builds a plan PER DATA SHARD (over that shard's contiguous row
# block) and stacks the leaves on a leading shard axis; sharded with
# P('data') each device holds exactly its own plan.  The lookup runs inside a
# shard_map region — each chip executes the same Pallas kernels on its local
# rows; the table stays replicated (in_spec P()), so shard_map's transpose
# inserts the one psum that data-parallel embedding gradients need.  This is
# the grads-reduced-by-XLA DP story with the scatter replaced by the planned
# kernels; it requires the 'model' axis to be trivial (row-sharded tables
# keep the plain GSPMD gather path).
# ---------------------------------------------------------------------------

def make_sharded_sort_plan(flat_ids, num_rows: int, n_shards: int,
                           compact: bool = False, dim: int = 32):
    """Per-data-shard sort plans, leaves stacked on a leading [n_shards] axis.

    ``flat_ids`` must be the row-major flattening of the batch's id matrix so
    that an equal split is exactly the per-device row blocks produced by
    sharding the batch with P('data')."""
    import numpy as np

    ids = np.asarray(flat_ids).reshape(-1)
    if ids.size % n_shards:
        raise ValueError(f"{ids.size} lookups do not split into {n_shards} "
                         f"equal data shards")
    # n_shards == 1 still returns STACKED [1, ...] leaves: mesh-mode plans are
    # identified by their leading shard axis (a 1-device mesh is still a mesh)
    blocks = ids.reshape(n_shards, -1)
    plans = [make_sort_plan(b, num_rows, compact, dim=dim) for b in blocks]
    return {k: np.stack([p[k] for p in plans]) for k in plans[0]}


def sharded_plan_matches(plan, num_lookups: int, num_rows: int,
                         n_shards: int, dim: int = 32) -> bool:
    """Shape check for a stacked per-shard plan (leading axis = n_shards)."""
    if plan is None or "meta" not in plan:
        return False
    if getattr(plan["meta"], "ndim", 1) != 2 or num_lookups % n_shards:
        return False
    n_local = num_lookups // n_shards
    k = plan_chunks_for_tile(n_local, num_rows,
                             _plan_tile(plan, num_rows, dim))
    return (plan["meta"].shape == (n_shards, k)
            and plan["perm"].shape == (n_shards, k * CHUNK)
            and plan.get("inv_perm") is not None
            and plan["inv_perm"].shape == (n_shards, n_local))


def planned_value_dp(table: jnp.ndarray, ids: jnp.ndarray, plan,
                     mesh) -> jnp.ndarray:
    """Forward-only planned lookup under a data-parallel mesh (capture mode:
    the table is stop-gradded by the caller, so no vjp is needed).  ``plan``
    may be stacked per-shard (ids row-sharded) or plain (replicated partial
    batch — every chip runs the full lookup on its replica)."""
    from jax.sharding import PartitionSpec as P

    from ...parallel.mesh import DATA_AXIS

    sharded = getattr(plan["meta"], "ndim", 1) == 2

    def _local(table, ids, plan):
        if sharded:
            plan = {k: v[0] for k, v in plan.items()}
        return _planned_value(table, ids, plan)

    spec = P(DATA_AXIS) if sharded else P()
    return jax.shard_map(
        _local, mesh=mesh, in_specs=(P(), spec, spec),
        out_specs=spec, check_vma=False,
    )(table, ids, plan)


def planned_gather_dp(table: jnp.ndarray, ids: jnp.ndarray, plan,
                      mesh) -> jnp.ndarray:
    """planned_gather under a data-parallel mesh: ids row-sharded over
    'data', table replicated, ``plan`` a stacked per-shard plan.  Forward is
    the per-chip scan-select/gather; backward is the per-chip chunk kernel's
    dense [V, D] partial psum'd over 'data' (inserted by shard_map's
    transpose of the replicated table input)."""
    from jax.sharding import PartitionSpec as P

    from ...parallel.mesh import DATA_AXIS

    def _local(table, ids, plan):
        local_plan = {k: v[0] for k, v in plan.items()}
        return planned_gather(table, ids, local_plan)

    return jax.shard_map(
        _local, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS), check_vma=False,
    )(table, ids, plan)


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


def _kernel_enabled(prefer_kernel: bool) -> bool:
    # REC_PANGU_TPU_FAST_SCATTER: on / off / auto (default).
    #
    # AUTO enables the kernel only where the CALL SITE asks for it
    # (prefer_kernel=True — lookups whose ids are generated on device and so
    # can never carry a host plan, e.g. ContraRec/IOCRec augmentations: the
    # kernel turns their 58 ms XLA scatter into ~10 ms), on single-device
    # TPU (a bare Pallas call must not reach a multi-device jit outside
    # shard_map).  Host-fed planless lookups stay on the XLA scatter in auto
    # mode: the device-side argsort prep makes a full CTR step slower there
    # (31.8 vs 25.0 ms on v5e).  Force =1 / =0 to override everywhere.
    import os

    mode = os.environ.get("REC_PANGU_TPU_FAST_SCATTER", "auto")
    if mode in ("1", "on", "true"):
        return True
    if mode in ("0", "off", "false"):
        return False
    if not prefer_kernel:
        return False
    from ...parallel.mesh import active_mesh

    return active_mesh() is None and jax.default_backend() == "tpu"


def fused_gather(table: jnp.ndarray, ids: jnp.ndarray,
                 prefer_kernel: bool = False) -> jnp.ndarray:
    """Embedding gather whose backward uses the Pallas sorted-segment
    accumulator on TPU for large tables; plain jnp.take otherwise.
    ``prefer_kernel`` marks call sites with device-generated ids (see
    _kernel_enabled)."""
    if (table.ndim == 2 and table.shape[0] >= _MIN_TABLE_ROWS
            and ids.size >= _MIN_LOOKUPS and _kernel_enabled(prefer_kernel)):
        return _kernel_gather(table, ids)
    return jnp.take(table, ids, axis=0)
