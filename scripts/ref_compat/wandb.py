"""No-op wandb stand-in for running the reference in-image (VERDICT.md item 1).

The reference only calls wandb when a wandb_config is passed
(rec_pangu/trainer.py:46-49,69-72); the parity runs never do, so these
functions exist only to satisfy the module-level `import wandb`.
"""


def login(*args, **kw):
    return True


def init(*args, **kw):
    return None


def log(*args, **kw):
    return None


def finish(*args, **kw):
    return None
