"""FiBiNet ratings leg, both sides, multiple seeds (dev script, VERDICT r3
item 3): distinguishes a semantic gap from an equal-budget/seed-noise gap.
Usage: exp_fibinet_es.py {repo|ref} [fixed] [MODEL=FiBiNet]  — 'fixed' uses
the parity protocol (5 epochs, no early stopping) instead of the examples'
ES config; MODEL picks any ranking model registered on both sides."""
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
side = sys.argv[1] if len(sys.argv) > 1 else "repo"
seeds = [1029, 1030, 1031]

from parity_common import RATINGS_SCHEMA, RATINGS_BATCH, load_ratings_ctr

rat_train, rat_valid, rat_test = load_ratings_ctr()

name = "FiBiNet"
for a in sys.argv[2:]:
    if a != "fixed":
        name = a
if side == "ref":
    sys.path.insert(0, os.path.join(_HERE, "ref_compat"))
    sys.path.insert(0, "/root/reference")
    import numpy as np
    import pandas as pd
    if not hasattr(pd.DataFrame, "append"):
        def _df_append(self, other, ignore_index=False):
            other_df = pd.DataFrame([other]) if isinstance(other, dict) else other
            return pd.concat([self, other_df], ignore_index=ignore_index)
        pd.DataFrame.append = _df_append
    import rec_pangu.model_pipeline as _mp
    from sklearn.metrics import log_loss as _sk_log_loss

    def _log_loss_eps(y_true, y_pred, eps=1e-7, **kw):
        y_pred = np.clip(np.asarray(y_pred, dtype=np.float64), eps, 1.0 - eps)
        return _sk_log_loss(y_true, y_pred, **kw)

    _mp.log_loss = _log_loss_eps
    from rec_pangu.dataset import get_dataloader
    from rec_pangu.trainer import RankTrainer
    import rec_pangu.models.ranking as _rank
    from rec_pangu.models.utils import seed_everything
    model_ctor = lambda enc: getattr(_rank, name)(enc_dict=enc)
else:
    from rec_pangu_tpu.data import get_dataloader
    from rec_pangu_tpu.models import get_model
    from rec_pangu_tpu.train import RankTrainer
    from rec_pangu_tpu.utils import seed_everything
    model_ctor = lambda enc: get_model(name)(enc_dict=enc)

train_loader, valid_loader, test_loader, enc_dict = get_dataloader(
    rat_train, rat_valid, rat_test, RATINGS_SCHEMA, batch_size=RATINGS_BATCH)
for seed in seeds:
    seed_everything(seed)
    if side == "repo":
        # vary BOTH the shuffle order and the init key per seed (the shared
        # loader's rng and fit()'s default seed are otherwise fixed at 1029,
        # which silently collapses a "seed sweep" into three identical runs)
        from rec_pangu_tpu.data.loader import DataLoader as _DL

        train_loader = _DL(train_loader.dataset, batch_size=RATINGS_BATCH,
                           shuffle=True, seed=seed)
    model = model_ctor(enc_dict)
    tr = RankTrainer(num_task=1, model_ckpt_dir=f"/tmp/fibes_{side}_{name}_{seed}")
    t0 = time.time()
    fit_kw = {"seed": seed} if side == "repo" else {}
    if "fixed" in sys.argv:
        tr.fit(model, train_loader, valid_loader, epoch=5, lr=1e-3, **fit_kw)
    else:
        tr.fit(model, train_loader, valid_loader, epoch=15, lr=1e-3,
               use_earlystopping=True, max_patience=3,
               monitor_metric="roc_auc_score", **fit_kw)
    print(side, name, seed, tr.evaluate_model(model, test_loader),
          f"{time.time() - t0:.1f}s", flush=True)
