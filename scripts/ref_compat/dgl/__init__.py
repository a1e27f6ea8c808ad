"""Import-only dgl stand-in so the reference package imports in this image.

The parity configs (ranking / multi-task / classic+multi-interest sequence
models) never touch dgl at runtime; only the session-graph models
(rec_pangu/models/utils.py:250-260) and NGCF would, and those raise a clear
error here rather than silently misbehaving.
"""


class DGLGraph:  # referenced by type hints in rec_pangu/dataset/graph_dataset.py:1
    pass


def graph(*args, **kw):
    raise RuntimeError(
        "dgl shim: session-graph construction is not available in the in-image "
        "reference run (dgl is not installed; see scripts/ref_compat/)."
    )
