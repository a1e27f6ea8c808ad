"""Train-quality A/B for the fused Pallas encoder on the real chip (dev
script): SASRec on the 64k MovieLens protocol, REC_PANGU_TPU_FUSED_ENCODER
on vs off, same seed.  The dropout streams differ (threefry vs on-chip PRNG)
so trajectories are not bit-equal; recall@50 within seed noise is the
acceptance bar."""
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
import pandas as pd

from parity_common import SEQ_BATCH, repo_path

from rec_pangu_tpu.data import get_dataloader
from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.train import SequenceTrainer
from rec_pangu_tpu.utils import enable_compilation_cache, seed_everything

enable_compilation_cache()

seq_schema = {"user_col": "user_id", "item_col": "item_id",
              "cate_cols": ["genre"], "max_length": 20,
              "time_col": "timestamp", "task_type": "sequence"}
config = {"embedding_dim": 64, "K": 4, "device": -1, **seq_schema}
d = repo_path("examples/sequence_recall/sample_data")
loaders = get_dataloader(pd.read_csv(f"{d}/sample_train.csv"),
                         pd.read_csv(f"{d}/sample_valid.csv"),
                         pd.read_csv(f"{d}/sample_test.csv"),
                         seq_schema, batch_size=SEQ_BATCH)
train_loader, valid_loader, test_loader, enc_dict = loaders

name = sys.argv[1] if len(sys.argv) > 1 else "SASRec"
seed = int(os.environ.get("SEED", "1029"))
for flag in ("0", "1"):
    os.environ["REC_PANGU_TPU_FUSED_ENCODER"] = flag
    seed_everything(seed)
    model = get_model(name)(enc_dict=enc_dict, config=config)
    tr = SequenceTrainer(model_ckpt_dir=f"/tmp/feq_{name}_{flag}")
    t0 = time.time()
    tr.fit(model, train_loader, None, epoch=20, lr=1e-3, log_rounds=100,
           seed=seed)
    m = tr.evaluate_model(model, test_loader)
    print(f"seed={seed} FUSED_ENCODER={flag}: {m}  {time.time() - t0:.0f}s", flush=True)
