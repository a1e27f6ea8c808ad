"""A/B: Adam moment storage dtype for the fused table update (dev script).

REC_PANGU_TPU_MOMENT_DTYPE=bf16 halves the m/v HBM streams of the
roofline-bound fused Adam pass (ops/kernels/fused_adam.py).  This measures
the end-to-end step effect at the bench shapes; quality impact is measured
separately by re-running the ratings CTR leg (scripts/fill_baseline.py) with
the flag set.

Measured 2026-08-20 (TPU v5e, tunneled, 30-step means, same process):
    see docs/perf_notes.md §1 for the recorded numbers.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # noqa: E402

from rec_pangu_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

for dt in ("f32", "bf16"):
    os.environ["REC_PANGU_TPU_MOMENT_DTYPE"] = dt
    for name, fn in [("DeepFM", lambda: B.bench_ranking("DeepFM")),
                     ("WDL", lambda: B.bench_ranking("WDL")),
                     ("SASRec", lambda: B.bench_sequence("SASRec")),
                     ("GRU4Rec", lambda: B.bench_sequence("GRU4Rec"))]:
        eps, fused = fn()
        print(f"{dt:5s} {name:8s} {eps:>12,.0f} ex/s (fused={fused})",
              flush=True)
