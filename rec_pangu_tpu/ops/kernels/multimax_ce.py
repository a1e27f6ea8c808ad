"""Pallas TPU kernels for the K-max multi-interest softmax CE.

IOCRec's recommendation loss (parity: rec_pangu/models/sequence/iocrec.py:79-104)
is ``CE_v(max_k u_bk . item_v)``.  The XLA scan in ``ops/softmax_ce.py``
streams the vocabulary in chunks but each chunk step still materializes K
``[B, C]`` logit tensors plus the running max in HBM — ~270 MB of traffic
per 8192-item chunk at B=1024, K=4, i.e. the scan is HBM-bound at ~35 GB per
forward pass while the matmul work is only ~0.5 TFLOP.

These kernels keep everything on-chip: the item table streams through VMEM in
``TILE_V``-row tiles (Mosaic double-buffers the affine-indexed fetch), the K
per-interest logit tiles live only in VMEM, and the running online-logsumexp
state is carried in VMEM scratch across sequential grid steps.  HBM traffic
drops to the irreducible one pass over the item table (+ one d_items write in
the backward).

Forward:  grid over item tiles; z = max_k(u_k @ tile^T) in VMEM; online
          (m, s) update; last step writes lse = m + log s.
Backward: recomputes each tile's z/argmax from the saved lse, routes p to the
          winning interest (mk = p * [ks == k]), accumulates du into a
          VMEM-resident [K, B, D] output block and writes each tile's
          d_items block.  The mean scale and the positive-class terms are
          applied by the caller (ops/softmax_ce.py), identically to the
          scan path.

Numerics: matmuls at DEFAULT precision with f32 accumulation — the same as
the scan path; equality pinned by tests/test_kernels.py in interpret mode
and the chip lane.  (Measured r04: an explicit bf16 cast of the dot inputs
is bit-identical and ~equal speed — DEFAULT precision on TPU already runs
f32 matmul inputs through bf16 MXU passes; and stacking the K per-interest
dots into one [K*B, D] dot was 40% SLOWER because it forces 4x smaller item
tiles — scripts/exp_ce_dtype.py.)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30  # finite -inf: exp underflows to exactly 0


def _choose_tile(b: int, v_pad: int) -> int:
    """Largest item-tile (multiple of 128, <= 2048) keeping the [B, T] logit
    scratch around ~4 MB so forward+backward fit VMEM comfortably.

    The cap is a measured optimum, not a VMEM ceiling (physical VMEM is
    ~128 MB): the r5 tile sweep (scripts/exp_multimax_roofline.py) found
    T=1024 at B=1024 ~8% faster than the old 2 MB cap's T=512 (fewer grid
    steps -> less per-step VPU mask/online overhead), while T=2048 blows
    the backward's residency.  ``REC_PANGU_TPU_MULTIMAX_TILE`` overrides
    for experiments."""
    import os

    forced = os.environ.get("REC_PANGU_TPU_MULTIMAX_TILE")
    if forced:
        t = int(forced)
        while v_pad % t:
            t //= 2
        return max(t, 128)
    t = 2048
    while t > 128 and b * t * 4 > 4 * 1024 * 1024:
        t //= 2
    while v_pad % t:
        t //= 2
    return max(t, 128)


def _fwd_kernel(u_ref, items_ref, lse_ref, m_ref, s_ref, *, k, tile_v,
                n_tiles, valid_v):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        s_ref[:] = jnp.zeros_like(s_ref)

    tile = items_ref[:, :]  # [T, D]; contract D on both -> [B, T]
    z = jax.lax.dot_general(u_ref[0], tile, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    for i in range(1, k):
        zi = jax.lax.dot_general(u_ref[i], tile,
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        z = jnp.maximum(z, zi)
    col = t * tile_v + jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    z = jnp.where(col < valid_v, z, _NEG)

    m_old = m_ref[:, :]
    m_new = jnp.maximum(m_old, jnp.max(z, axis=1, keepdims=True))
    s_ref[:] = (s_ref[:, :] * jnp.exp(m_old - m_new)
                + jnp.sum(jnp.exp(z - m_new), axis=1, keepdims=True))
    m_ref[:] = m_new

    @pl.when(t == n_tiles - 1)
    def _emit():
        lse_ref[:] = m_ref[:, :] + jnp.log(s_ref[:, :])


def _bwd_kernel(u_ref, items_ref, lse_ref, du_ref, di_ref, *,
                k, tile_v, n_tiles, valid_v):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        du_ref[:] = jnp.zeros_like(du_ref)

    tile = items_ref[:, :]  # [T, D]; contract D on both -> [B, T]
    z = jax.lax.dot_general(u_ref[0], tile, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    ks = jnp.zeros(z.shape, jnp.int32)
    for i in range(1, k):
        zi = jax.lax.dot_general(u_ref[i], tile,
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        upd = zi > z
        z = jnp.where(upd, zi, z)
        ks = jnp.where(upd, i, ks)
    col = t * tile_v + jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    p = jnp.where(col < valid_v, jnp.exp(z - lse_ref[:, :]), 0.0)  # [B, T]

    di = None
    for i in range(k):
        mk = jnp.where(ks == i, p, 0.0)
        # du_k += mk @ tile           [B, T] x [T, D]
        du_ref[i] += jax.lax.dot_general(
            mk, tile, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # d_tile += mk^T @ u_k        [T, B] x [B, D]
        d = jax.lax.dot_general(mk, u_ref[i], (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        di = d if di is None else di + d
    di_ref[:] = di


def _grid_call(u_t, items_p, valid_v, tile_v, interpret, lse=None):
    """Shared plumbing for the two kernels.  ``u_t`` is [K, B, D] f32;
    ``items_p`` is [V_pad, D] f32 with V_pad % tile_v == 0."""
    k, b, d = u_t.shape
    v_pad = items_p.shape[0]
    n_tiles = v_pad // tile_v
    u_spec = pl.BlockSpec((k, b, d), lambda t: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    items_spec = pl.BlockSpec((tile_v, d), lambda t: (t, 0),
                              memory_space=pltpu.VMEM)
    if lse is None:
        return pl.pallas_call(
            functools.partial(_fwd_kernel, k=k, tile_v=tile_v,
                              n_tiles=n_tiles, valid_v=valid_v),
            grid=(n_tiles,),
            in_specs=[u_spec, items_spec],
            out_specs=pl.BlockSpec((b, 1), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((b, 1), jnp.float32),        # running max
                pltpu.VMEM((b, 1), jnp.float32),        # running sum
            ],
            # narrow-D shapes lane-pad every [T, D] buffer to 128 lanes,
            # which can push the scoped default (16 MB) at the max tile
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(u_t, items_p)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, k=k, tile_v=tile_v,
                          n_tiles=n_tiles, valid_v=valid_v),
        grid=(n_tiles,),
        in_specs=[u_spec, items_spec,
                  pl.BlockSpec((b, 1), lambda t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((k, b, d), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),       # du (accumulated)
            pl.BlockSpec((tile_v, d), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),       # d_items tiles
        ],
        out_shape=[jax.ShapeDtypeStruct((k, b, d), jnp.float32),
                   jax.ShapeDtypeStruct((v_pad, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(u_t, items_p, lse)


def multimax_lse(user_embs: jnp.ndarray, items_p: jnp.ndarray,
                 valid_v: int, interpret: bool = False) -> jnp.ndarray:
    """[B] logsumexp_v(max_k u_bk . item_v) over a padded item table."""
    u_t = jnp.transpose(user_embs, (1, 0, 2)).astype(jnp.float32)
    tile_v = _choose_tile(u_t.shape[1], items_p.shape[0])
    lse = _grid_call(u_t, items_p.astype(jnp.float32), valid_v, tile_v,
                     interpret)
    return lse[:, 0]


def multimax_grads(user_embs: jnp.ndarray, items_p: jnp.ndarray,
                   lse: jnp.ndarray, valid_v: int,
                   interpret: bool = False):
    """(du [B, K, D], d_items [V_pad, D]): the softmax term of the K-max CE
    gradient, UNSCALED (no g/B factor, no positive-class terms)."""
    u_t = jnp.transpose(user_embs, (1, 0, 2)).astype(jnp.float32)
    tile_v = _choose_tile(u_t.shape[1], items_p.shape[0])
    du, d_items = _grid_call(u_t, items_p.astype(jnp.float32), valid_v,
                             tile_v, interpret, lse=lse[:, None])
    return jnp.transpose(du, (1, 0, 2)), d_items


_VMEM_BUDGET = 48 * 1024 * 1024  # the kernels request a 64 MB scoped limit
# (v5e physical VMEM is 128 MB); keep headroom for Mosaic's double buffers


def multimax_kernel_ok(b: int, k: int, d: int) -> bool:
    """Shape gate: f32-tileable operands AND total VMEM residency within
    budget.  The backward keeps the whole [K, B, D] ``u_t`` and ``du``
    blocks in VMEM plus ~3 [B, T] temporaries (z/p/mk) and 2 [T, D] item
    tiles — bounding only the [B, T] scratch (the old gate) admitted shapes
    like B=4096, K=8, D=256 that need >32 MB and fail Mosaic compilation."""
    if not (b % 8 == 0 and d % 8 == 0 and k >= 1
            and b * 128 * 4 <= 4 * 1024 * 1024):
        return False
    # the tile _choose_tile would pick in the best case (alignment can only
    # shrink it, which shrinks residency too) — same 4 MB [B, T] cap
    t = 2048
    while t > 128 and b * t * 4 > 4 * 1024 * 1024:
        t //= 2
    resident = 2 * k * b * d * 4 + 3 * b * t * 4 + 2 * t * d * 4
    return resident <= _VMEM_BUDGET
