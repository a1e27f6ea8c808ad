"""Ranking example — mirrors /root/reference/examples/ranking/run_ranking_example.py
on the bundled sample data, through the public rec_pangu_tpu API."""
import sys

sys.path.append("../../")
import pandas as pd

from rec_pangu_tpu.data import get_dataloader
from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.train import RankTrainer
import os

_HERE = os.path.dirname(os.path.abspath(__file__))

if __name__ == "__main__":
    df = pd.read_csv(
        os.path.join(_HERE, "sample_data", "ranking_sample_data.csv")
    )
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
    train_df, valid_df, test_df = df[:80], df[:90], df[:95]

    train_loader, valid_loader, test_loader, enc_dict = get_dataloader(
        train_df, valid_df, test_df, schema, batch_size=512
    )
    model = get_model("DeepFM")(enc_dict=enc_dict)
    trainer = RankTrainer(num_task=1, model_ckpt_dir="./model_ckpt")
    trainer.fit(model, train_loader, valid_loader, epoch=50, lr=1e-3,
                use_earlystopping=True, max_patience=5,
                monitor_metric="roc_auc_score")
    trainer.save_all(model, enc_dict, "./model_ckpt")
    test_metric = trainer.evaluate_model(model, test_loader)
    print("Test metric:", test_metric)

    preds = trainer.predict_dataframe(model, test_df, enc_dict, schema)
    print("predict_dataframe:", preds[:5], "...", preds.shape)
