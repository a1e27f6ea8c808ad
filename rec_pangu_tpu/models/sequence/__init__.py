from .comirec import ComirecDR, ComirecSA
from .gru4rec import GRU4Rec
from .mind import MIND
from .narm import NARM
from .nextitnet import NextItNet
from .sasrec import SASRec
from .stamp import STAMP
from .yotubednn import YotubeDNN

__all__ = [
    "ComirecDR", "ComirecSA", "GRU4Rec", "MIND", "NARM", "NextItNet",
    "SASRec", "STAMP", "YotubeDNN",
]
