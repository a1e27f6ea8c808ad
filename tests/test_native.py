"""Native C++ window builder: availability + exact parity with the Python path."""
import numpy as np
import pytest

from rec_pangu_tpu.data.sequence import SequenceDataset
from rec_pangu_tpu.native import native_available

from conftest import SEQ_SCHEMA


def test_native_compiles():
    assert native_available(), "g++ is in the image; the native lib should build"


def test_native_matches_python(seq_dfs):
    train, _, _ = seq_dfs
    ds = SequenceDataset(SEQ_SCHEMA, train, phase="train", seed=3)
    ks = ds._train_split_points()

    ds._build_python(ks.copy())
    py = {k: v.copy() for k, v in ds.arrays.items()}

    from rec_pangu_tpu.native import get_lib
    lib = get_lib()
    assert lib is not None
    ds._build_native(lib, ks.copy())
    nat = ds.arrays

    for key in ("hist_item_list", "hist_mask_list", "hist_genre_list",
                "target_item", "next_item_list", "next_mask_list"):
        np.testing.assert_array_equal(py[key], nat[key], err_msg=key)

    # eval phase parity too
    ds_eval = SequenceDataset(SEQ_SCHEMA, train, enc_dict=ds.enc_dict, phase="test")
    ks2 = ds_eval._eval_split_points()
    ds_eval._build_python(ks2)
    py2 = {k: (v.copy() if v.dtype != object else v) for k, v in ds_eval.arrays.items()}
    ds_eval._build_native(lib, ks2)
    for key in ("hist_item_list", "hist_mask_list"):
        np.testing.assert_array_equal(py2[key], ds_eval.arrays[key], err_msg=key)
