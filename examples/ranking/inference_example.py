"""Inference round-trip — mirrors /root/reference/examples/ranking/inference_example.py:
load a saved checkpoint (weights + enc_dict), rebuild the model, predict on a
label-less dataframe."""
import sys

sys.path.append("../../")
import pandas as pd

from rec_pangu_tpu.data import DataLoader, RankingDataset
from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.train import RankTrainer
from rec_pangu_tpu.train.ckpt import load_checkpoint
import os

_HERE = os.path.dirname(os.path.abspath(__file__))

if __name__ == "__main__":
    schema = {
        "sparse_cols": ["user_id", "item_id", "item_type", "dayofweek", "is_workday",
                        "city", "county", "town", "village", "lbs_city", "lbs_district",
                        "hardware_platform", "hardware_ischarging", "os_type",
                        "network_type", "position"],
        "dense_cols": ["item_expo_1d", "item_expo_7d", "item_expo_14d", "item_expo_30d",
                       "item_clk_1d", "item_clk_7d", "item_clk_14d", "item_clk_30d",
                       "use_duration"],
        "label_col": "click",
        "task_type": "ranking",
    }
    ckpt = load_checkpoint("./model_ckpt/model.ckpt")
    enc_dict = ckpt["enc_dict"]

    df = pd.read_csv(
        os.path.join(_HERE, "sample_data", "ranking_sample_data.csv")
    ).drop(columns=["click", "scroll"])[:20]

    model = get_model("DeepFM")(enc_dict=enc_dict)
    trainer = RankTrainer(num_task=1)
    ds = RankingDataset(schema, df, enc_dict=enc_dict)
    trainer._build_state(model, next(iter(DataLoader(ds, batch_size=20))), 1e-3, 1)
    trainer.load_model(model, "./model_ckpt/model.ckpt")
    preds = trainer.predict_dataframe(model, df, enc_dict, schema)
    print("Predictions:", preds[:10])
