"""Profile the fused-Adam step components at the bench shape (dev script)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from rec_pangu_tpu.utils import enable_compilation_cache

enable_compilation_cache()

from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.ops.embedding import attach_emb_plan
from rec_pangu_tpu.ops.kernels.embedding_grad import stream_ids
from rec_pangu_tpu.ops.kernels.fused_adam import adam_hyper, planned_adam_update
from rec_pangu_tpu.train.optim import make_optimizer
from rec_pangu_tpu.train.steps import create_train_state, make_train_step

BATCH, F, VOCAB, DIM = 8192, 16, 100_000, 32
rng = np.random.default_rng(0)
enc = {f"dense_{i}": {"min": 0.0, "max": 1.0} for i in range(9)}
enc.update({f"sparse_{i}": {"vocab_size": VOCAB} for i in range(F)})
batch = {
    "sparse": rng.integers(0, VOCAB, (BATCH, F), dtype=np.int32),
    "dense": rng.random((BATCH, 9), dtype=np.float32),
    "label": rng.integers(0, 2, (BATCH,)).astype(np.float32),
}
model = get_model("DeepFM")(enc_dict=enc, embedding_dim=DIM)
attach_emb_plan(batch, model.spec, DIM)
state = create_train_state(model, batch, make_optimizer(1e-3, 1),
                           jax.random.PRNGKey(0))


def timeit(fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / reps * 1e3


dbatch = jax.device_put(batch)
plan = dbatch["emb_plan"]
from rec_pangu_tpu.ops.kernels.embedding_grad import padded_rows

V = padded_rows(model.spec.total_rows)
table = jnp.zeros((V, DIM), jnp.float32)
mu = jnp.zeros_like(table)
nu = jnp.zeros_like(table)
rows = jnp.asarray(rng.standard_normal((BATCH * F, DIM)), jnp.float32)
ids = jnp.asarray(rng.integers(0, V, (BATCH * F,)), jnp.int32)
hyper = adam_hyper(jnp.asarray(1, jnp.int32), 1e-3)


@jax.jit
def kernel_only(plan, rows, table, mu, nu):
    istream = stream_ids(plan, ids, V)
    return planned_adam_update(plan, istream, rows, table, mu, nu, hyper)


print("fused adam kernel (incl. perm gather):",
      round(timeit(kernel_only, plan, rows, table, mu, nu), 2), "ms")

# full fused step vs std step (donating: thread the state through)
from rec_pangu_tpu.train.fused_update import maybe_enable_fused_update

srng = jax.random.PRNGKey(1)


def time_step(step, st, reps=30):
    for _ in range(3):
        st, out = step(st, dbatch, srng)
    _ = float(out["loss"])
    t0 = time.perf_counter()
    for _ in range(reps):
        st, out = step(st, dbatch, srng)
    _ = float(out["loss"])
    return (time.perf_counter() - t0) / reps * 1e3


fstate, fstep, _ = maybe_enable_fused_update(state, model, batch, 1e-3, 1)
print("fused step:", round(time_step(fstep, fstate), 2), "ms")

state2 = create_train_state(model, batch, make_optimizer(1e-3, 1),
                            jax.random.PRNGKey(0))
sstep = make_train_step(state2.batch_stats is not None)
print("std planned step:", round(time_step(sstep, state2), 2), "ms")

# --- decompose: perm gather vs kernel ---------------------------------------
perm = plan["perm"]


@jax.jit
def permute_t(r):
    return jnp.take(r.astype(jnp.float32).T, perm, axis=1)


@jax.jit
def permute_then_t(r):
    return jnp.take(r.astype(jnp.float32), perm, axis=0).T


print("perm gather (T-major take axis1):", round(timeit(permute_t, rows), 2), "ms")
print("perm gather (take axis0 then .T):", round(timeit(permute_then_t, rows), 2), "ms")

rows_t_pre = permute_t(rows)
from rec_pangu_tpu.ops.kernels import fused_adam as fa


@jax.jit
def kernel_pre(rt, table, mu, nu):
    import functools as ft
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from rec_pangu_tpu.ops.kernels.embedding_grad import _tile_rows
    num_rows = table.shape[0]
    tile = _tile_rows(num_rows)
    t_tiles = num_rows // tile
    dim = rt.shape[0]
    istream = stream_ids(plan, ids, num_rows)

    def big(io):
        return pl.BlockSpec((dim, tile), lambda t, starts, hyper: (0, t),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(t_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  big("in"), big("in"), big("in")],
        out_specs=[big("out"), big("out"), big("out")],
        scratch_shapes=[
            pltpu.VMEM((dim, tile), jnp.float32),
            pltpu.VMEM((fa.NBUF, 128), jnp.int32),
            pltpu.VMEM((fa.NBUF, dim, 128), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((fa.NBUF,)),
            pltpu.SemaphoreType.DMA((fa.NBUF,)),
        ])
    shape = jax.ShapeDtypeStruct((dim, num_rows), jnp.float32)
    return pl.pallas_call(
        ft.partial(fa._adam_tile_kernel, dim=dim, tile_rows=tile,
                   mode="split2", t_tiles=t_tiles),
        grid_spec=grid_spec, out_shape=[shape, shape, shape],
        input_output_aliases={4: 0, 5: 1, 6: 2},
    )(plan["tile_starts"], hyper, istream, rt, table.T, mu.T, nu.T)


V2 = padded_rows(model.spec.total_rows)
table2 = jnp.zeros((V2, DIM), jnp.float32)
print("kernel only (pre-permuted):",
      round(timeit(kernel_pre, rows_t_pre, table2, jnp.zeros_like(table2),
                   jnp.zeros_like(table2)), 2), "ms")
