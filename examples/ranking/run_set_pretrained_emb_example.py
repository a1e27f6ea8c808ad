"""Pretrained-embedding example — mirrors
/root/reference/examples/ranking/run_set_pretrained_emb_example.py."""
import sys

sys.path.append("../../")
import numpy as np
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
    train_loader, valid_loader, test_loader, enc_dict = get_dataloader(
        df[:80], df[:90], df[:95], schema, batch_size=512
    )
    dim = 32
    # pretend these came from a pretrained user tower
    pretrained_user_emb = {
        u: np.random.default_rng(0).random(dim).astype(np.float32)
        for u in list(enc_dict["user_id"])[:50] if u != "vocab_size"
    }
    model = get_model("WDL")(enc_dict=enc_dict, embedding_dim=dim)
    trainer = RankTrainer(num_task=1, model_ckpt_dir="./model_ckpt")
    trainer.set_pretrained_weights(model, "user_id", pretrained_user_emb,
                                   trainable=False)
    trainer.fit(model, train_loader, valid_loader, epoch=10, lr=1e-3)
    print("Test metric:", trainer.evaluate_model(model, test_loader))
