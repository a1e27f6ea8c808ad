"""A/B the K-max CE kernel's MXU input dtype (dev script): loss/grad delta
f32 vs bf16 on a fixed batch at the bench shape, and wall-clock.  Validates
REC_PANGU_TPU_CE_COMPUTE=bf16 (the bench config) — accumulation stays f32;
only the dot_general inputs round."""
import os
import time

import numpy as np

from rec_pangu_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from rec_pangu_tpu.ops.softmax_ce import fused_multimax_softmax_ce

B, V, D, K = 1024, 1_000_000, 64, 4
rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((B, K, D), dtype=np.float32) * 0.1)
items = jnp.asarray(rng.standard_normal((V, D), dtype=np.float32) * 0.1)
pos = jnp.asarray(rng.integers(1, V, (B,), dtype=np.int32))


def run():
    @jax.jit
    def f(u, items):
        def loss(u, items):
            return fused_multimax_softmax_ce(u, items, pos)

        l, g = jax.value_and_grad(loss, argnums=(0, 1))(u, items)
        return l, g

    l, g = f(u, items)
    l = float(l)
    t0 = time.perf_counter()
    for _ in range(10):
        l2, g = f(u, items)
    _ = float(l2)
    dt = (time.perf_counter() - t0) / 10 * 1e3
    return l, jax.tree.map(np.asarray, g), dt


os.environ["REC_PANGU_TPU_CE_COMPUTE"] = "f32"
l32, g32, t32 = run()
print(f"f32 : loss={l32:.6f}  {t32:.1f} ms", flush=True)
os.environ["REC_PANGU_TPU_CE_COMPUTE"] = "bf16"
lbf, gbf, tbf = run()
print(f"bf16: loss={lbf:.6f}  {tbf:.1f} ms", flush=True)
print(f"loss delta: {abs(lbf - l32):.2e} ({abs(lbf - l32) / abs(l32):.2%})")
for a, b, name in [(g32[0], gbf[0], "du"), (g32[1], gbf[1], "d_items")]:
    denom = np.abs(a).max()
    print(f"{name}: max|delta|/max|g| = {np.abs(a - b).max() / denom:.2e}")
