from .encoder import fit_enc_dict, fit_sequence_enc_dict, encode_ranking_df, FeatureSpec
from .dataset import RankingDataset, MultiTaskDataset
from .sequence import SequenceDataset, SequenceDatasetV2, seq_collate
from .loader import DataLoader
from .process_data import get_dataloader, get_single_dataloader

__all__ = [
    "fit_enc_dict",
    "fit_sequence_enc_dict",
    "encode_ranking_df",
    "FeatureSpec",
    "RankingDataset",
    "MultiTaskDataset",
    "SequenceDataset",
    "SequenceDatasetV2",
    "seq_collate",
    "DataLoader",
    "get_dataloader",
    "get_single_dataloader",
]
