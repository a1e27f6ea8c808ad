"""A/B the fused planned-Adam kernel against dense optax.adam (dev script)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from rec_pangu_tpu.ops.kernels.embedding_grad import make_sort_plan, stream_ids
from rec_pangu_tpu.ops.kernels.fused_adam import adam_hyper, planned_adam_update


def main():
    rng = np.random.default_rng(0)
    V, D, N = 4096, 32, 2048
    ids = rng.integers(0, V, (N,), dtype=np.int64)
    plan = make_sort_plan(ids, V)
    table = rng.standard_normal((V, D)).astype(np.float32) * 0.01
    mu = np.zeros((V, D), np.float32)
    nu = np.zeros((V, D), np.float32)
    rows = rng.standard_normal((N, D)).astype(np.float32)

    # reference: dense grad + optax.adam, two steps for bias-correction cover
    tx = optax.adam(1e-3)
    p_ref = jnp.asarray(table)
    opt = tx.init(p_ref)
    p_f, mu_f, nu_f = jnp.asarray(table), jnp.asarray(mu), jnp.asarray(nu)
    ids_stream = stream_ids(plan, jnp.asarray(ids, jnp.int32), V)
    for t in (1, 2):
        g = jax.ops.segment_sum(jnp.asarray(rows), jnp.asarray(ids), V)
        upd, opt = tx.update(g, opt, p_ref)
        p_ref = optax.apply_updates(p_ref, upd)
        hyper = adam_hyper(jnp.asarray(t, jnp.int32), 1e-3)
        p_f, mu_f, nu_f = planned_adam_update(
            plan, ids_stream, jnp.asarray(rows), p_f, mu_f, nu_f, hyper)
        err = float(jnp.max(jnp.abs(p_f - p_ref)))
        scale = float(jnp.max(jnp.abs(p_ref - jnp.asarray(table))))
        print(f"step {t}: max |p_fused - p_ref| = {err:.3e}  (max update {scale:.3e})")
    mu_ref = opt[0].mu
    nu_ref = opt[0].nu
    print("mu err", float(jnp.max(jnp.abs(mu_f - mu_ref))),
          "nu err", float(jnp.max(jnp.abs(nu_f - nu_ref))))


if __name__ == "__main__":
    main()
