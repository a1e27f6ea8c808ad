"""Adversarial decomposition of the K-max multi-interest CE kernel
(VERDICT r4 weak item 2): where do the 36 ms go at B=1024, K=4, V=1M, D=64?

Legs:
  1. tile sweep — fwd and fwd+bwd at T in {512, 1024, 2048}
  2. component isolation (fwd, best tile): dots-only, dots+max (no exp),
     full online-lse; and K=1 (the single-interest shape) for the floor
  3. the integrated fused_multimax_softmax_ce fwd / fwd+bwd

Writes human-readable lines; perf_notes.md §6 records the conclusions.
"""
import functools
import os
import time

import numpy as np

from rec_pangu_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rec_pangu_tpu.ops.kernels import multimax_ce as mm

B, K, V, D = 1024, 4, 1_000_000, 64
rng = np.random.default_rng(0)
users = jnp.asarray(rng.standard_normal((B, K, D)), jnp.float32) * 0.1
V_pad = ((V + 2048 - 1) // 2048) * 2048
items_p = jnp.asarray(rng.standard_normal((V_pad, D)), jnp.float32) * 0.1
pos = jnp.asarray(rng.integers(1, V, (B,)), jnp.int32)


def timeit(fn, *args, reps=10):
    out = fn(*args)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    return (time.perf_counter() - t0) / reps * 1e3


# ---- leg 1: tile sweep -----------------------------------------------------
for tile in (512, 1024, 2048):
    os.environ["REC_PANGU_TPU_MULTIMAX_TILE"] = str(tile)

    @jax.jit
    def lse_fn(u, it):
        return mm.multimax_lse(u, it, V)

    @jax.jit
    def grads_fn(u, it):
        lse = mm.multimax_lse(u, it, V)
        return mm.multimax_grads(u, it, lse, V)

    try:
        f = timeit(lse_fn, users, items_p)
        fb = timeit(grads_fn, users, items_p)
        print(f"tile {tile}: fwd {f:.1f} ms   fwd+bwd-kernels {fb:.1f} ms",
              flush=True)
    except Exception as e:  # Mosaic OOM etc.
        print(f"tile {tile}: FAILED {type(e).__name__}", flush=True)
os.environ.pop("REC_PANGU_TPU_MULTIMAX_TILE", None)


# ---- leg 2: component isolation (modified fwd kernels) ---------------------
def _fwd_variant(u_ref, items_ref, out_ref, acc_ref, *, k, tile_v, n_tiles,
                 valid_v, mode):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tile = items_ref[:, :]
    z = jax.lax.dot_general(u_ref[0], tile, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if mode == "dots":
        for i in range(1, k):
            z = z + jax.lax.dot_general(u_ref[i], tile,
                                        (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
        acc_ref[:] += jnp.sum(z, axis=1, keepdims=True)
    else:  # dots+max (no exp / online update)
        for i in range(1, k):
            zi = jax.lax.dot_general(u_ref[i], tile,
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            z = jnp.maximum(z, zi)
        col = t * tile_v + jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
        z = jnp.where(col < valid_v, z, -1e30)
        acc_ref[:] += jnp.sum(z, axis=1, keepdims=True)

    @pl.when(t == n_tiles - 1)
    def _emit():
        out_ref[:] = acc_ref[:, :]


def run_variant(u, it, mode, k=K, tile_v=1024):
    u_t = jnp.transpose(u[:, :k], (1, 0, 2)).astype(jnp.float32)
    v_pad = it.shape[0]
    n_tiles = v_pad // tile_v
    return pl.pallas_call(
        functools.partial(_fwd_variant, k=k, tile_v=tile_v, n_tiles=n_tiles,
                          valid_v=V, mode=mode),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((k, B, D), lambda t: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tile_v, D), lambda t: (t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, 1), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(u_t, it)


for mode in ("dots", "dotsmax"):
    fn = jax.jit(functools.partial(run_variant, mode=mode))
    print(f"fwd {mode}-only (T=1024): {timeit(fn, users, items_p):.1f} ms",
          flush=True)

# K=1 full online-lse — the single-interest floor at identical plumbing
os.environ["REC_PANGU_TPU_MULTIMAX_TILE"] = "1024"


@jax.jit
def lse_k1(u, it):
    return mm.multimax_lse(u[:, :1], it, V)


print(f"fwd K=1 full: {timeit(lse_k1, users, items_p):.1f} ms", flush=True)


@jax.jit
def lse_k4(u, it):
    return mm.multimax_lse(u, it, V)


print(f"fwd K=4 full: {timeit(lse_k4, users, items_p):.1f} ms", flush=True)


@jax.jit
def bwd_k1(u, it):
    lse = mm.multimax_lse(u[:, :1], it, V)
    return mm.multimax_grads(u[:, :1], it, lse, V)


print(f"fwd+bwd K=1 kernels: {timeit(bwd_k1, users, items_p):.1f} ms",
      flush=True)
os.environ.pop("REC_PANGU_TPU_MULTIMAX_TILE", None)

# ---- leg 3: the integrated loss -------------------------------------------
from rec_pangu_tpu.ops.softmax_ce import fused_multimax_softmax_ce

items_v = items_p[:V + 1]


@jax.jit
def ce_fwd(u, it):
    return fused_multimax_softmax_ce(u, it, pos)


@jax.jit
def ce_grad(u, it):
    return jax.grad(lambda a, b: fused_multimax_softmax_ce(a, b, pos),
                    (0, 1))(u, it)


print(f"integrated CE fwd: {timeit(ce_fwd, users, items_v):.1f} ms",
      flush=True)
print(f"integrated CE fwd+bwd: {timeit(ce_grad, users, items_v):.1f} ms",
      flush=True)
