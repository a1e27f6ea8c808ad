"""FiBiNet ratings-leg A/B for the table-init fix (dev script, VERDICT r3
item 3): the round-3 miss (test AUC 0.7229 vs reference 0.7363) traces to
flax variance_scaling reading fan_in = table ROWS (std sqrt(2/10k) ~ 0.014)
where torch kaiming uses fan_in = D (std 0.25) — FiBiNet's DNN input is
exclusively bilinear PRODUCTS of embeddings, so its input scale started
~300x smaller than the reference's.  Runs the identical parity protocol
(scripts/parity_common.py) with the fixed TABLE_INIT."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from parity_common import (RATINGS_SCHEMA, RATINGS_EPOCHS, RATINGS_BATCH,
                           load_ratings_ctr)

from rec_pangu_tpu.data import get_dataloader
from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.train import RankTrainer
from rec_pangu_tpu.utils import seed_everything

name = sys.argv[1] if len(sys.argv) > 1 else "FiBiNet"
rat_train, rat_valid, rat_test = load_ratings_ctr()
train_loader, valid_loader, test_loader, enc_dict = get_dataloader(
    rat_train, rat_valid, rat_test, RATINGS_SCHEMA, batch_size=RATINGS_BATCH)
seed_everything(1029)
model = get_model(name)(enc_dict=enc_dict)
tr = RankTrainer(num_task=1, model_ckpt_dir=f"/tmp/fibinit_ckpt/{name}")
t0 = time.time()
tr.fit(model, train_loader, valid_loader, epoch=RATINGS_EPOCHS, lr=1e-3)
print(name, tr.evaluate_model(model, test_loader),
      f"{time.time() - t0:.1f}s", flush=True)
