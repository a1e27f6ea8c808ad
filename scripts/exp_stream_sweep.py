"""Locate the Pallas HBM-streaming inefficiency (dev script).

Sweeps: #streams x tile width for [D=32, V=1.6M] f32 arrays, plus a
bf16-storage variant.  All kernels are trivial elementwise (copy/scale) so
time == streaming cost.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rec_pangu_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import rec_pangu_tpu.ops.kernels.embedding_grad as eg

DIM = 32
V = eg.padded_rows(16 * 100_000)
rng = np.random.default_rng(0)
arrs = [jnp.asarray(rng.standard_normal((DIM, V)), jnp.float32)
        for _ in range(3)]


def timeit(fn, *args, reps=30):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0][0, 0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0][0, 0])
    return (time.perf_counter() - t0) / reps * 1e3


def make(n_streams, tile, dtype=jnp.float32, alias=True):
    def kern(*refs):
        ins, outs = refs[:n_streams], refs[n_streams:]
        for i, o in zip(ins, outs):
            o[:] = i[:, :] * 0.99

    def spec():
        return pl.BlockSpec((DIM, tile), lambda t: (0, t),
                            memory_space=pltpu.VMEM)

    shape = jax.ShapeDtypeStruct((DIM, V), dtype)

    @jax.jit
    def run(*xs):
        return pl.pallas_call(
            kern,
            grid=(V // tile,),
            in_specs=[spec() for _ in range(n_streams)],
            out_specs=[spec() for _ in range(n_streams)],
            out_shape=[shape] * n_streams,
            input_output_aliases={i: i for i in range(n_streams)} if alias else {},
        )(*xs)

    return run


for n in (1, 3):
    for tile in (2048, 4096):
        fn = make(n, tile)
        ms = timeit(fn, *arrs[:n])
        gb = n * 2 * DIM * V * 4 / 1e9
        print(f"{n}R+{n}W f32 tile {tile}: {ms:.2f} ms "
              f"({gb / ms * 1e3:.0f} GB/s)", flush=True)

# read-only heavy: 3 reads, 1 tiny out
def make_readonly(tile):
    def kern(a, b, c, o):
        o[:] = a[:, :] + b[:, :] + c[:, :]

    def spec():
        return pl.BlockSpec((DIM, tile), lambda t: (0, t),
                            memory_space=pltpu.VMEM)

    @jax.jit
    def run(a, b, c):
        return pl.pallas_call(
            kern, grid=(V // tile,),
            in_specs=[spec()] * 3, out_specs=spec(),
            out_shape=jax.ShapeDtypeStruct((DIM, V), jnp.float32),
        )(a, b, c)

    return run


for tile in (2048, 4096):
    ms = timeit(make_readonly(tile), *arrs)
    gb = (3 + 1) * DIM * V * 4 / 1e9
    print(f"3R+1W f32 tile {tile}: {ms:.2f} ms ({gb / ms * 1e3:.0f} GB/s)",
          flush=True)

# bf16 storage halves bytes
arrs16 = [a.astype(jnp.bfloat16) for a in arrs]
for tile in (2048, 4096):
    fn = make(3, tile, jnp.bfloat16)
    ms = timeit(fn, *arrs16)
    gb = 3 * 2 * DIM * V * 2 / 1e9
    print(f"3R+3W bf16 tile {tile}: {ms:.2f} ms ({gb / ms * 1e3:.0f} GB/s)",
          flush=True)

# XLA reference on identical op
@jax.jit
def xla3(a, b, c):
    return a * 0.99, b * 0.99, c * 0.99


print("XLA 3R+3W f32:", round(timeit(xla3, *arrs), 2), "ms", flush=True)


# variants: no aliasing / parallel dimension semantics
def make_v(n_streams, tile, alias, parallel):
    def kern(*refs):
        ins, outs = refs[:n_streams], refs[n_streams:]
        for i, o in zip(ins, outs):
            o[:] = i[:, :] * 0.99

    def spec():
        return pl.BlockSpec((DIM, tile), lambda t: (0, t),
                            memory_space=pltpu.VMEM)

    shape = jax.ShapeDtypeStruct((DIM, V), jnp.float32)
    params = {}
    if parallel:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",))

    @jax.jit
    def run(*xs):
        return pl.pallas_call(
            kern, grid=(V // tile,),
            in_specs=[spec() for _ in range(n_streams)],
            out_specs=[spec() for _ in range(n_streams)],
            out_shape=[shape] * n_streams,
            input_output_aliases={i: i for i in range(n_streams)} if alias else {},
            **params,
        )(*xs)

    return run


for alias in (True, False):
    for parallel in (False, True):
        fn = make_v(3, 2048, alias, parallel)
        try:
            ms = timeit(fn, *arrs)
            gb = 3 * 2 * DIM * V * 4 / 1e9
            print(f"3R+3W alias={alias} parallel={parallel}: {ms:.2f} ms "
                  f"({gb / ms * 1e3:.0f} GB/s)", flush=True)
        except Exception as e:
            print(f"alias={alias} parallel={parallel}: FAILED {str(e)[:100]}",
                  flush=True)
