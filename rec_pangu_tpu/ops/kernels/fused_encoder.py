"""Fused Pallas TPU kernel for the post-LN transformer encoder stack.

The IOCRec/CLRec-shaped encoder ([N, L=50, D=64], 2 heads, post-LN, relu
FFN) is HBM/VPU-bound under XLA: every block is ~60 small fused ops that
round-trip [N, L, D] activations (and [N, H, L, L] attention tensors)
through HBM — measured 20.8 ms fwd+bwd dropout-free at N=3072 against ~1 ms
of MXU work (scripts/exp_iocrec_local.py).  This kernel keeps a TB-row tile
resident in VMEM through ALL layers: HBM traffic drops to one read of x and
one write of y (+ parameter broadcast), and the backward recomputes the
forward per tile (flash-style) instead of storing activations in HBM.

Design notes (TPU-first):
* All matmuls are plain 2-D dots on [TB*L, D] flats.  Per-head attention
  uses LANE MASKING instead of head reshapes: scores_h = (q ⊙ m_h) @ k^T
  and ctx_h = probs_h @ (v ⊙ m_h), summed over heads — identical math
  because the masked-out lanes contribute zeros, and it keeps the MXU on
  full-width [TB*L, D] operands (no sub-lane head slicing).
* Attention over the tile runs as ONE [TB*L, TB*L] score matrix with a
  static block-diagonal causal mask (cross-sample blocks are -inf): ~TB x
  arithmetic waste on the scores, but one dot instead of TB tiny ones —
  at TB=8 the waste is ~41 MF/tile against a 128x128 systolic array that
  would otherwise idle.
* Dropout masks come from the on-chip PRNG (pltpu.prng_seed folded with the
  tile index; the backward re-seeds identically and replays the same
  draws).  The stream differs from flax's threefry — distribution-identical,
  pinned OFF for the equality tests.

Parity: math matches ops/sequence_enc.TransformerEncoder (post-LN, additive
mask, relu FFN) — equality (dropout off) pinned by tests/test_fused_encoder.py
in interpret mode and the chip lane.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e6  # additive mask value (matches sequence_enc's where(mask,0,-1e6))


def _ln(x, g, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + eps) * g + b


def _ln_bwd(x, g, eps, dy):
    """VJP of _ln wrt (x, g, b) given the ORIGINAL input x."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = xc * inv
    dg = jnp.sum(dy * xhat, axis=0)
    db = jnp.sum(dy, axis=0)
    dxhat = dy * g
    d = x.shape[-1]
    dx = inv * (dxhat - jnp.mean(dxhat, axis=-1, keepdims=True)
                - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    return dx, dg, db


def _act_fn(h, act: str):
    if act == "relu":
        return jnp.maximum(h, 0.0)
    if act == "gelu":  # tanh approximation — matches flax nn.gelu default
        c = 0.7978845608028654  # sqrt(2/pi)
        return 0.5 * h * (1.0 + jnp.tanh(c * (h + 0.044715 * h * h * h)))
    if act in ("swish", "silu"):
        return h * jax.nn.sigmoid(h)
    raise NotImplementedError(act)


def _act_grad(h, act: str):
    if act == "relu":
        return (h > 0.0).astype(h.dtype)
    if act == "gelu":
        c = 0.7978845608028654
        u = c * (h + 0.044715 * h * h * h)
        t = jnp.tanh(u)
        du = c * (1.0 + 3.0 * 0.044715 * h * h)
        return 0.5 * (1.0 + t) + 0.5 * h * (1.0 - t * t) * du
    if act in ("swish", "silu"):
        sg = jax.nn.sigmoid(h)
        return sg * (1.0 + h * (1.0 - sg))
    raise NotImplementedError(act)


def _drop_mask(shape, rate):
    """Multiplicative inverted-dropout mask from the on-chip PRNG.

    ``prng_random_bits`` yields int32 BIT PATTERNS; comparing them against a
    uint32 threshold silently promotes through int32 overflow (the uint
    2^31 becomes INT32_MIN, making every element "keep" — caught by the
    chip-lane seed-sensitivity test).  xor with the sign bit is the
    monotonic uint->int map, after which a signed compare is exact."""
    bits = pltpu.prng_random_bits(shape)
    t_u = min(int(rate * (1 << 32)), (1 << 32) - 1)
    flipped = jnp.bitwise_xor(bits.astype(jnp.int32), jnp.int32(-(1 << 31)))
    keep = flipped >= jnp.int32(t_u - (1 << 31))
    return keep.astype(jnp.float32) / (1.0 - rate)


def _attention(x, w, b, head_masks, add_mask, scale, attn_drop, train):
    """One attention sub-layer on the [R=TB*L, D] flat tile.
    Returns (ctx, saved) where saved carries tensors for the backward."""
    q = jnp.dot(x, w[0], preferred_element_type=jnp.float32) + b[0]
    k = jnp.dot(x, w[1], preferred_element_type=jnp.float32) + b[1]
    v = jnp.dot(x, w[2], preferred_element_type=jnp.float32) + b[2]
    ctx = None
    saved = []
    for hm in head_masks:
        qh = q * hm
        scores = jnp.dot(qh, k.T, preferred_element_type=jnp.float32) * scale
        scores = scores + add_mask
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        s = jnp.sum(e, axis=-1, keepdims=True)
        probs = e / s
        if train and attn_drop > 0.0:
            dm = _drop_mask(probs.shape, attn_drop)
            probs_d = probs * dm
        else:
            dm = None
            probs_d = probs
        vh = v * hm
        c = jnp.dot(probs_d, vh, preferred_element_type=jnp.float32)
        ctx = c if ctx is None else ctx + c
        saved.append((probs, dm))
    out = jnp.dot(ctx, w[3], preferred_element_type=jnp.float32) + b[3]
    return out, (q, k, v, ctx, saved)


def _encoder_fwd_tile(x, kv_add_mask, params, seed, t, *, n_layers, head_masks,
                      scale, inner, hdrop, adrop, eps, act, train, want_saved):
    """Run the full stack on one flat tile.  Returns (y, saved_per_layer)."""
    (wqkvo, bqkvo, w1, b1, w2, b2, ln_g, ln_b) = params
    if train and (hdrop > 0.0 or adrop > 0.0):
        pltpu.prng_seed(seed, t)  # traced per-step seed + tile index
    saved_layers = []
    for li in range(n_layers):
        x_in = x
        attn_out, attn_saved = _attention(
            x, wqkvo[li], bqkvo[li], head_masks, kv_add_mask, scale,
            adrop, train)
        if train and hdrop > 0.0:
            dm1 = _drop_mask(attn_out.shape, hdrop)
            attn_out = attn_out * dm1
        else:
            dm1 = None
        pre_ln1 = attn_out + x_in
        x1 = _ln(pre_ln1, ln_g[li, 0], ln_b[li, 0], eps)
        h = jnp.dot(x1, w1[li], preferred_element_type=jnp.float32) + b1[li]
        hr = _act_fn(h, act)
        f = jnp.dot(hr, w2[li], preferred_element_type=jnp.float32) + b2[li]
        if train and hdrop > 0.0:
            dm2 = _drop_mask(f.shape, hdrop)
            f = f * dm2
        else:
            dm2 = None
        pre_ln2 = f + x1
        x = _ln(pre_ln2, ln_g[li, 1], ln_b[li, 1], eps)
        if want_saved:
            saved_layers.append((x_in, attn_saved, dm1, pre_ln1, x1, h, hr,
                                 dm2, pre_ln2))
    return x, saved_layers


def _fwd_kernel(x_ref, kvalid_ref, smask_ref, seed_ref, *param_refs, out_ref,
                n_layers, n_heads, L, D, inner, hdrop, adrop, eps, act,
                train):
    t = pl.program_id(0)
    seed = seed_ref[0]
    TBL = x_ref.shape[0]
    x = x_ref[...]
    params = tuple(r[...] for r in param_refs)
    # kvalid arrives as an [R, 1] column; broadcasting it across ROWS (to
    # mask score COLUMNS) is a rank-1 outer product — Mosaic cannot shape-
    # cast a [tb, L] tile into lanes, but a [R,1]x[R,1]^T dot is native
    kvcol = kvalid_ref[...].astype(jnp.float32)            # [R, 1]
    colmask = jax.lax.dot_general(
        jnp.ones((TBL, 1), jnp.float32), kvcol,
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    add_mask = jnp.where(smask_ref[...] & (colmask > 0.0), 0.0, _NEG)
    dh = D // n_heads
    head_masks = []
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1)
    for h in range(n_heads):
        head_masks.append(((lane >= h * dh) & (lane < (h + 1) * dh))
                          .astype(jnp.float32))
    y, _ = _encoder_fwd_tile(
        x, add_mask, params, seed, t, n_layers=n_layers,
        head_masks=head_masks, scale=1.0 / float(np.sqrt(dh)), inner=inner,
        hdrop=hdrop, adrop=adrop, eps=eps, act=act, train=train,
        want_saved=False)
    out_ref[...] = y


def _bwd_kernel(x_ref, kvalid_ref, smask_ref, seed_ref, dy_ref, *refs,
                n_layers, n_heads, L, D, inner, hdrop, adrop, eps, act,
                train):
    # refs = param_refs (8) then output refs: dx, then 8 param-grad refs
    seed = seed_ref[0]
    param_refs = refs[:8]
    dx_ref = refs[8]
    grad_refs = refs[9:]
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        for gr in grad_refs:
            gr[...] = jnp.zeros_like(gr)

    TBL = x_ref.shape[0]
    x0 = x_ref[...]
    params = tuple(r[...] for r in param_refs)
    (wqkvo, bqkvo, w1, b1, w2, b2, ln_g, ln_b) = params
    kvcol = kvalid_ref[...].astype(jnp.float32)            # [R, 1]
    colmask = jax.lax.dot_general(
        jnp.ones((TBL, 1), jnp.float32), kvcol,
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    add_mask = jnp.where(smask_ref[...] & (colmask > 0.0), 0.0, _NEG)
    dh = D // n_heads
    head_masks = []
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1)
    for h in range(n_heads):
        head_masks.append(((lane >= h * dh) & (lane < (h + 1) * dh))
                          .astype(jnp.float32))
    scale = 1.0 / float(np.sqrt(dh))
    _, saved = _encoder_fwd_tile(
        x0, add_mask, params, seed, t, n_layers=n_layers,
        head_masks=head_masks, scale=scale, inner=inner, hdrop=hdrop,
        adrop=adrop, eps=eps, act=act, train=train, want_saved=True)

    # per-(layer, slot) grads collected in PYTHON lists (static indices) and
    # stacked at the end — jnp .at[].add on values lowers to scatter-add,
    # which Mosaic does not implement
    g_wqkvo = [[None] * 4 for _ in range(n_layers)]
    g_bqkvo = [[None] * 4 for _ in range(n_layers)]
    g_w1 = [None] * n_layers
    g_b1 = [None] * n_layers
    g_w2 = [None] * n_layers
    g_b2 = [None] * n_layers
    g_lng = [[None] * 2 for _ in range(n_layers)]
    g_lnb = [[None] * 2 for _ in range(n_layers)]

    dy = dy_ref[...]
    for li in range(n_layers - 1, -1, -1):
        (x_in, attn_saved, dm1, pre_ln1, x1, h, hr, dm2, pre_ln2) = saved[li]
        q, k, v, ctx, head_saved = attn_saved
        # ln2
        dpre2, dg2, db2_ = _ln_bwd(pre_ln2, ln_g[li, 1], eps, dy)
        g_lng[li][1] = dg2
        g_lnb[li][1] = db2_
        df = dpre2 * dm2 if dm2 is not None else dpre2
        dx1 = dpre2
        # ffn
        g_b2[li] = jnp.sum(df, axis=0)
        g_w2[li] = jnp.dot(hr.T, df, preferred_element_type=jnp.float32)
        dhr = jnp.dot(df, w2[li].T, preferred_element_type=jnp.float32)
        dh_ = dhr * _act_grad(h, act)
        g_b1[li] = jnp.sum(dh_, axis=0)
        g_w1[li] = jnp.dot(x1.T, dh_, preferred_element_type=jnp.float32)
        dx1 = dx1 + jnp.dot(dh_, w1[li].T, preferred_element_type=jnp.float32)
        # ln1
        dpre1, dg1, db1_ = _ln_bwd(pre_ln1, ln_g[li, 0], eps, dx1)
        g_lng[li][0] = dg1
        g_lnb[li][0] = db1_
        dattn = dpre1 * dm1 if dm1 is not None else dpre1
        dx_in = dpre1
        # output projection
        g_bqkvo[li][3] = jnp.sum(dattn, axis=0)
        g_wqkvo[li][3] = jnp.dot(ctx.T, dattn,
                                 preferred_element_type=jnp.float32)
        dctx = jnp.dot(dattn, wqkvo[li, 3].T,
                       preferred_element_type=jnp.float32)
        dq = jnp.zeros_like(q)
        dk = jnp.zeros_like(k)
        dv = jnp.zeros_like(v)
        for hi, hm in enumerate(head_masks):
            probs, dm = head_saved[hi]
            vh = v * hm
            probs_d = probs * dm if dm is not None else probs
            dprobs_d = jnp.dot(dctx, vh.T, preferred_element_type=jnp.float32)
            dvh = jnp.dot(probs_d.T, dctx, preferred_element_type=jnp.float32)
            dv = dv + dvh * hm
            dprobs = dprobs_d * dm if dm is not None else dprobs_d
            # softmax bwd
            dscores = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1,
                                                keepdims=True))
            dscores = dscores * scale
            qh = q * hm
            dqh = jnp.dot(dscores, k, preferred_element_type=jnp.float32)
            dq = dq + dqh * hm
            dk = dk + jnp.dot(dscores.T, qh,
                              preferred_element_type=jnp.float32)
        for gi, gvec in ((0, dq), (1, dk), (2, dv)):
            g_bqkvo[li][gi] = jnp.sum(gvec, axis=0)
            g_wqkvo[li][gi] = jnp.dot(x_in.T, gvec,
                                      preferred_element_type=jnp.float32)
            dx_in = dx_in + jnp.dot(gvec, wqkvo[li, gi].T,
                                    preferred_element_type=jnp.float32)
        dy = dx_in
    dx_ref[...] = dy
    outs = (
        jnp.stack([jnp.stack(r) for r in g_wqkvo]),
        jnp.stack([jnp.stack(r) for r in g_bqkvo]),
        jnp.stack(g_w1), jnp.stack(g_b1), jnp.stack(g_w2), jnp.stack(g_b2),
        jnp.stack([jnp.stack(r) for r in g_lng]),
        jnp.stack([jnp.stack(r) for r in g_lnb]),
    )
    for gr, val in zip(grad_refs, outs):
        gr[...] += val


def encoder_tb(default: int = 4) -> int:
    """Rows-per-tile for the fused encoder family.  ``REC_PANGU_TPU_ENCODER_TB``
    overrides for experiments; callers must still gate divisibility on the
    value returned here."""
    import os

    v = os.environ.get("REC_PANGU_TPU_ENCODER_TB")
    return int(v) if v else default


def _static_mask(tb: int, L: int, causal: bool) -> np.ndarray:
    """[TB*L, TB*L] bool: same-sample (AND causal when requested)."""
    r = np.arange(tb * L)
    sample = r // L
    m = sample[:, None] == sample[None, :]
    if causal:
        pos = r % L
        m = m & (pos[:, None] >= pos[None, :])
    return m


def _pack_call(x_flat, kvalid_flat, smask, seed_arr, params, dy=None, *, N,
               tb, L, D, n_layers, n_heads, inner, hdrop, adrop, eps, act,
               train, interpret):
    n_tiles = N // tb
    R = tb * L
    tile_spec = pl.BlockSpec((R, D), lambda t: (t, 0),
                             memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((R, 1), lambda t: (t, 0), memory_space=pltpu.VMEM)
    sm_spec = pl.BlockSpec((R, R), lambda t: (0, 0), memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec((1,), lambda t: (0,),
                             memory_space=pltpu.SMEM)
    p_specs = [pl.BlockSpec(p.shape, lambda t, nd=p.ndim: (0,) * nd,
                            memory_space=pltpu.VMEM) for p in params]
    kw = dict(n_layers=n_layers, n_heads=n_heads, L=L, D=D, inner=inner,
              hdrop=hdrop, adrop=adrop, eps=eps, act=act, train=train)
    if dy is None:
        def fwd(x_ref, kvalid_ref, smask_ref, seed_ref, *prefs_and_out):
            _fwd_kernel(x_ref, kvalid_ref, smask_ref, seed_ref,
                        *prefs_and_out[:-1],
                        out_ref=prefs_and_out[-1], **kw)

        return pl.pallas_call(
            fwd,
            grid=(n_tiles,),
            in_specs=[tile_spec, kv_spec, sm_spec, seed_spec, *p_specs],
            out_specs=tile_spec,
            out_shape=jax.ShapeDtypeStruct((N * L, D), jnp.float32),
            interpret=interpret,
        )(x_flat, kvalid_flat, smask, seed_arr, *params)

    def bwd(x_ref, kvalid_ref, smask_ref, seed_ref, dy_ref, *prefs_and_outs):
        _bwd_kernel(x_ref, kvalid_ref, smask_ref, seed_ref, dy_ref,
                    *prefs_and_outs, **kw)

    grad_shapes = [jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in params]
    grad_specs = [pl.BlockSpec(p.shape, lambda t, nd=p.ndim: (0,) * nd,
                               memory_space=pltpu.VMEM) for p in params]
    return pl.pallas_call(
        bwd,
        grid=(n_tiles,),
        in_specs=[tile_spec, kv_spec, sm_spec, seed_spec, tile_spec, *p_specs],
        out_specs=[tile_spec, *grad_specs],
        out_shape=[jax.ShapeDtypeStruct((N * L, D), jnp.float32),
                   *grad_shapes],
        # the recompute-backward holds the replayed per-layer activations
        # (incl. [R, R] attention probs + dropout masks) in VMEM — above the
        # 16 MB scoped default, well under the physical budget
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_flat, kvalid_flat, smask, seed_arr, dy, *params)


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14))
def fused_encoder(x, params, key_valid, seed, n_layers, n_heads, inner,
                  hdrop, adrop, eps, train, tb, interpret, causal=True,
                  act="relu"):
    """x [N, L, D] f32; params tuple of 8 stacked arrays (see pack_params);
    key_valid [N, L] {0,1}; seed a TRACED int32 scalar (dropout stream —
    changing it does not retrace).  ``causal=False`` gives the
    bidirectional (BERT4Rec-style) padding-only mask.  Returns y [N, L, D]."""
    y, _ = _fe_fwd(x, params, key_valid, seed, n_layers, n_heads, inner,
                   hdrop, adrop, eps, train, tb, interpret, causal, act)
    return y


def _fe_fwd(x, params, key_valid, seed, n_layers, n_heads, inner, hdrop,
            adrop, eps, train, tb, interpret, causal=True, act="relu"):
    N, L, D = x.shape
    smask = jnp.asarray(_static_mask(tb, L, causal))
    x_flat = x.reshape(N * L, D)
    kv = key_valid.astype(jnp.int32).reshape(N * L, 1)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    y = _pack_call(x_flat, kv, smask, seed_arr, params, None, N=N, tb=tb,
                   L=L, D=D, n_layers=n_layers, n_heads=n_heads, inner=inner,
                   hdrop=hdrop, adrop=adrop, eps=eps, act=act, train=train,
                   interpret=interpret)
    return y.reshape(N, L, D), (x, params, key_valid, seed_arr)


def _fe_bwd(n_layers, n_heads, inner, hdrop, adrop, eps, train, tb,
            interpret, causal, act, res, dy):
    x, params, key_valid, seed_arr = res
    N, L, D = x.shape
    smask = jnp.asarray(_static_mask(tb, L, causal))
    x_flat = x.reshape(N * L, D)
    kv = key_valid.astype(jnp.int32).reshape(N * L, 1)
    outs = _pack_call(x_flat, kv, smask, seed_arr, params,
                      dy.reshape(N * L, D), N=N, tb=tb, L=L, D=D,
                      n_layers=n_layers, n_heads=n_heads, inner=inner,
                      hdrop=hdrop, adrop=adrop, eps=eps, act=act,
                      train=train, interpret=interpret)
    dx = outs[0].reshape(N, L, D)
    dparams = tuple(outs[1:])
    return dx, dparams, None, None


fused_encoder.defvjp(_fe_fwd, _fe_bwd)


def fused_encoder_dp(x, params, key_valid, seed, mesh, n_layers, n_heads,
                     inner, hdrop, adrop, eps, train, tb, interpret,
                     causal=True, act="relu"):
    """fused_encoder under a data-parallel mesh: rows sharded over 'data',
    params replicated, each chip running the kernel on its local rows inside
    a shard_map region (the same pattern as the planned embedding kernels —
    docs/perf_notes.md §1; a bare pallas_call must never reach a multi-device
    jit).  The backward's replicated-param cotangents are psum'd by
    shard_map's transpose.  Dropout streams are decorrelated across shards
    by folding the shard index into the seed."""
    from jax.sharding import PartitionSpec as P

    from ...parallel.mesh import DATA_AXIS

    def _local(x, kv, params, seed):
        sidx = jax.lax.axis_index(DATA_AXIS)
        local_seed = (seed + sidx * jnp.int32(-1640531527)).astype(jnp.int32)
        return fused_encoder(x, params, kv, local_seed, n_layers, n_heads,
                             inner, hdrop, adrop, eps, train, tb, interpret,
                             causal, act)

    return jax.shard_map(
        _local, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(), P()),
        out_specs=P(DATA_AXIS), check_vma=False,
    )(x, key_valid, params, jnp.asarray(seed, jnp.int32))


def encoder_mesh_ok(n_rows: int, tb: int = 4):
    """Gate helper for the fused-encoder family under an active mesh.

    Returns (ok, mesh, per_shard_rows): ``ok`` says whether the kernel may
    run at all; ``mesh`` is the data-parallel mesh to shard_map over (None =
    single-device direct call); ``per_shard_rows`` is the per-chip row count
    the tile-divisibility checks should use.  A non-trivial 'model' axis or
    a non-dividing batch keeps the kernels off (flax/GSPMD path)."""
    from ...parallel.mesh import DATA_AXIS, MODEL_AXIS, active_mesh

    mesh = active_mesh()
    if mesh is None:
        return True, None, n_rows
    if mesh.shape[MODEL_AXIS] != 1:
        return False, None, n_rows  # row-sharded tables: GSPMD end-to-end
    n_data = mesh.shape[DATA_AXIS]
    if n_rows % n_data or (n_rows // n_data) % tb:
        return False, None, n_rows
    # the axon shim reports default_backend "tpu"/"axon" even when the mesh
    # is built from FORCED-HOST CPU devices — the mesh's own device platform
    # decides whether the kernel can lower (cpu needs interpret mode)
    from .embedding_grad import _interpret

    plat = next(iter(np.asarray(mesh.devices).flat)).platform
    if plat == "cpu" and not _interpret():
        return False, None, n_rows
    if plat not in ("cpu", "tpu"):
        return False, None, n_rows
    return True, mesh, n_rows // n_data


def pack_params(variables_params, n_layers: int) -> Tuple[jnp.ndarray, ...]:
    """Stack a sequence_enc.TransformerEncoder param tree (flax) into the
    kernel's 8 arrays: wqkvo [Lyr,4,D,D], bqkvo [Lyr,4,D], w1 [Lyr,D,inner],
    b1 [Lyr,inner], w2 [Lyr,inner,D], b2 [Lyr,D], ln_g/ln_b [Lyr,2,D]."""
    wq, bq, w1s, b1s, w2s, b2s, lg, lb = [], [], [], [], [], [], [], []
    for li in range(n_layers):
        blk = variables_params[f"TransformerBlock_{li}"]
        wq.append(jnp.stack([blk["query"]["kernel"], blk["key"]["kernel"],
                             blk["value"]["kernel"], blk["dense"]["kernel"]]))
        bq.append(jnp.stack([blk["query"]["bias"], blk["key"]["bias"],
                             blk["value"]["bias"], blk["dense"]["bias"]]))
        w1s.append(blk["ffn_1"]["kernel"])
        b1s.append(blk["ffn_1"]["bias"])
        w2s.append(blk["ffn_2"]["kernel"])
        b2s.append(blk["ffn_2"]["bias"])
        lg.append(jnp.stack([blk["LayerNorm_0"]["scale"],
                             blk["LayerNorm_1"]["scale"]]))
        lb.append(jnp.stack([blk["LayerNorm_0"]["bias"],
                             blk["LayerNorm_1"]["bias"]]))
    return (jnp.stack(wq), jnp.stack(bq), jnp.stack(w1s), jnp.stack(b1s),
            jnp.stack(w2s), jnp.stack(b2s), jnp.stack(lg), jnp.stack(lb))
