"""Fused Pallas TPU kernel for IOCRec's GlobalSeqEncoder.

The encoder (parity: rec_pangu/models/sequence/iocrec.py:197-228) is one
cross-attention with a learned query bank: ``softmax(Q_s @ K(x)^T) @ V(x)``
followed by output dropout — ~5 GFLOP at the bench shape, yet 10.9 ms
fwd+bwd under XLA because every sub-op round-trips [3B, L, D] / [3B, L, L]
activations through HBM.  This kernel runs TB samples per grid step with
everything VMEM-resident (same tiling pattern as fused_encoder.py): one
[TB*L, TB*L] block-diagonal score matrix per tile, dropout from the on-chip
PRNG, flash-style recompute in the backward.

Quirk preserved deliberately: the reference applies NO padding mask to the
scores (iocrec.py:220-222) — padded positions attend like real ones — so
neither does the kernel; block off-diagonals (cross-sample pairs) are the
only masked entries.

Parity: equality with the XLA path (dropout off) pinned by
tests/test_fused_encoder.py::test_global_attn_kernel_matches_xla in
interpret mode and the chip lane.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_encoder import _drop_mask

_NEG = -1e9  # cross-sample score mask


def _expand_masks(tb: int, L: int):
    """Static helpers: [R, L] one-hot (row r -> Q_s row r%L) and the [R, R]
    additive block-diagonal mask (cross-sample pairs -> -inf)."""
    r = np.arange(tb * L)
    onehot = (r[:, None] % L == np.arange(L)[None, :]).astype(np.float32)
    sample = r // L
    add = np.where(sample[:, None] == sample[None, :], 0.0, _NEG)
    return onehot, add.astype(np.float32)


def _tile_fwd(x, onehot, add_mask, wk, bk, wv, bv, q_s, seed, t, drop, train,
              want_saved):
    if train and drop > 0.0:
        pltpu.prng_seed(seed, t)
    k = jnp.dot(x, wk, preferred_element_type=jnp.float32) + bk
    v = jnp.dot(x, wv, preferred_element_type=jnp.float32) + bv
    qtile = jnp.dot(onehot, q_s, preferred_element_type=jnp.float32)
    scores = jnp.dot(qtile, k.T, preferred_element_type=jnp.float32) + add_mask
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    ctx = jnp.dot(probs, v, preferred_element_type=jnp.float32)
    if train and drop > 0.0:
        dm = _drop_mask(ctx.shape, drop)
        y = ctx * dm
    else:
        dm = None
        y = ctx
    if want_saved:
        return y, (k, v, qtile, probs, ctx, dm)
    return y, None


def _fwd_kernel(x_ref, onehot_ref, amask_ref, seed_ref, wk_ref, bk_ref,
                wv_ref, bv_ref, qs_ref, out_ref, *, drop, train):
    t = pl.program_id(0)
    y, _ = _tile_fwd(x_ref[...], onehot_ref[...], amask_ref[...],
                     wk_ref[...], bk_ref[...], wv_ref[...], bv_ref[...],
                     qs_ref[...], seed_ref[0], t, drop, train, False)
    out_ref[...] = y


def _bwd_kernel(x_ref, onehot_ref, amask_ref, seed_ref, dy_ref, wk_ref,
                bk_ref, wv_ref, bv_ref, qs_ref, dx_ref, gwk_ref, gbk_ref,
                gwv_ref, gbv_ref, gqs_ref, *, drop, train):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        for gr in (gwk_ref, gbk_ref, gwv_ref, gbv_ref, gqs_ref):
            gr[...] = jnp.zeros_like(gr)

    x = x_ref[...]
    onehot = onehot_ref[...]
    wk, wv = wk_ref[...], wv_ref[...]
    _, saved = _tile_fwd(x, onehot, amask_ref[...], wk, bk_ref[...], wv,
                         bv_ref[...], qs_ref[...], seed_ref[0], t, drop,
                         train, True)
    k, v, qtile, probs, ctx, dm = saved
    dy = dy_ref[...]
    dctx = dy * dm if dm is not None else dy
    dv = jnp.dot(probs.T, dctx, preferred_element_type=jnp.float32)
    dprobs = jnp.dot(dctx, v.T, preferred_element_type=jnp.float32)
    dscores = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1,
                                        keepdims=True))
    # HIGHEST precision on the Q_s grad chain: it takes TWO stacked dots
    # (dscores @ k, then the one-hot row fold) where the XLA reference path
    # contracts once — a second DEFAULT-precision bf16 rounding there was
    # the one measurable deviation from the flax grads on device (chip
    # lane, max ~0.2% of grad scale); these dots are tiny ([R,R]@[R,D])
    dqtile = jnp.dot(dscores, k, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    dk = jnp.dot(dscores.T, qtile, preferred_element_type=jnp.float32)
    gqs_ref[...] += jnp.dot(onehot.T, dqtile,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    gwk_ref[...] += jnp.dot(x.T, dk, preferred_element_type=jnp.float32)
    gbk_ref[...] += jnp.sum(dk, axis=0)
    gwv_ref[...] += jnp.dot(x.T, dv, preferred_element_type=jnp.float32)
    gbv_ref[...] += jnp.sum(dv, axis=0)
    dx_ref[...] = (jnp.dot(dk, wk.T, preferred_element_type=jnp.float32)
                   + jnp.dot(dv, wv.T, preferred_element_type=jnp.float32))


def _call(x_flat, seed_arr, params, dy, *, N, tb, L, D, drop, train,
          interpret):
    wk, bk, wv, bv, q_s = params
    onehot, add = _expand_masks(tb, L)
    onehot = jnp.asarray(onehot)
    add = jnp.asarray(add)
    n_tiles = N // tb
    R = tb * L
    tile_spec = pl.BlockSpec((R, D), lambda t: (t, 0),
                             memory_space=pltpu.VMEM)
    oh_spec = pl.BlockSpec((R, L), lambda t: (0, 0), memory_space=pltpu.VMEM)
    am_spec = pl.BlockSpec((R, R), lambda t: (0, 0), memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec((1,), lambda t: (0,), memory_space=pltpu.SMEM)
    p_specs = [pl.BlockSpec(p.shape, lambda t, nd=p.ndim: (0,) * nd,
                            memory_space=pltpu.VMEM) for p in params]
    if dy is None:
        return pl.pallas_call(
            functools.partial(_fwd_kernel, drop=drop, train=train),
            grid=(n_tiles,),
            in_specs=[tile_spec, oh_spec, am_spec, seed_spec, *p_specs],
            out_specs=tile_spec,
            out_shape=jax.ShapeDtypeStruct((N * L, D), jnp.float32),
            interpret=interpret,
        )(x_flat, onehot, add, seed_arr, *params)
    grad_shapes = [jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in params]
    grad_specs = [pl.BlockSpec(p.shape, lambda t, nd=p.ndim: (0,) * nd,
                               memory_space=pltpu.VMEM) for p in params]
    return pl.pallas_call(
        functools.partial(_bwd_kernel, drop=drop, train=train),
        grid=(n_tiles,),
        in_specs=[tile_spec, oh_spec, am_spec, seed_spec, tile_spec,
                  *p_specs],
        out_specs=[tile_spec, *grad_specs],
        out_shape=[jax.ShapeDtypeStruct((N * L, D), jnp.float32),
                   *grad_shapes],
        interpret=interpret,
    )(x_flat, onehot, add, seed_arr, dy, *params)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def global_attn(x, params, seed, drop, train, tb, interpret):
    """x [N, L, D] f32; params = (wk [D,D], bk [D], wv [D,D], bv [D],
    q_s [L,D]); seed a TRACED int32 scalar.  Returns y [N, L, D]."""
    y, _ = _ga_fwd(x, params, seed, drop, train, tb, interpret)
    return y


def _ga_fwd(x, params, seed, drop, train, tb, interpret):
    N, L, D = x.shape
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    y = _call(x.reshape(N * L, D), seed_arr, params, None, N=N, tb=tb, L=L,
              D=D, drop=drop, train=train, interpret=interpret)
    return y.reshape(N, L, D), (x, params, seed_arr)


def _ga_bwd(drop, train, tb, interpret, res, dy):
    x, params, seed_arr = res
    N, L, D = x.shape
    outs = _call(x.reshape(N * L, D), seed_arr, params,
                 dy.reshape(N * L, D), N=N, tb=tb, L=L, D=D, drop=drop,
                 train=train, interpret=interpret)
    return outs[0].reshape(N, L, D), tuple(outs[1:]), None


global_attn.defvjp(_ga_fwd, _ga_bwd)


def global_attn_dp(x, params, seed, mesh, drop, train, tb, interpret):
    """global_attn under a data-parallel mesh: rows sharded over 'data',
    params replicated, per-shard kernel in a shard_map region; dropout
    streams decorrelated by folding the shard index into the seed (same
    pattern as fused_encoder_dp)."""
    from jax.sharding import PartitionSpec as P

    from ...parallel.mesh import DATA_AXIS

    def _local(x, params, seed):
        sidx = jax.lax.axis_index(DATA_AXIS)
        local_seed = (seed + sidx * jnp.int32(-1640531527)).astype(jnp.int32)
        return global_attn(x, params, local_seed, drop, train, tb, interpret)

    return jax.shard_map(
        _local, mesh=mesh, in_specs=(P(DATA_AXIS), P(), P()),
        out_specs=P(DATA_AXIS), check_vma=False,
    )(x, params, jnp.asarray(seed, jnp.int32))
