"""Leave-one-out sequence example — mirrors
/root/reference/examples/sequence_recall/run_sequence_example_v2.py
(SequenceDatasetV2: train at len-3, valid at len-2, test at len-1)."""
import os
import sys

sys.path.append("../../")
import pandas as pd

from rec_pangu_tpu.data import get_dataloader
from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.train import SequenceTrainer

_HERE = os.path.dirname(os.path.abspath(__file__))

if __name__ == "__main__":
    schema = {
        "user_col": "user_id",
        "item_col": "item_id",
        "cate_cols": ["genre"],
        "max_length": 20,
        "time_col": "timestamp",
        "task_type": "sequence",
        "protocol": "v2",
    }
    config = {"embedding_dim": 64, "lr": 0.001, "K": 4, "device": -1}
    config.update(schema)

    data_dir = os.path.join(_HERE, "sample_data")
    train_df = pd.read_csv(f"{data_dir}/sample_train.csv")
    valid_df = pd.read_csv(f"{data_dir}/sample_valid.csv")
    test_df = pd.read_csv(f"{data_dir}/sample_test.csv")

    train_loader, valid_loader, test_loader, enc_dict = get_dataloader(
        train_df, valid_df, test_df, schema, batch_size=256
    )
    model_name = os.environ.get("SEQ_MODEL", "SASRec")
    model = get_model(model_name)(enc_dict=enc_dict, config=config)
    trainer = SequenceTrainer(model_ckpt_dir="./model_ckpt_v2")
    trainer.fit(model, train_loader, valid_loader,
                epoch=int(os.environ.get("SEQ_EPOCHS", "3")), lr=1e-3,
                log_rounds=10)
    print("Test metric:", trainer.evaluate_model(model, test_loader))
