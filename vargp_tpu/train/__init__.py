"""Training & evaluation loops (parity: var_gp/train_utils.py,
experiments/vargp.py:train)."""

from vargp_tpu.train.stopper import EarlyStopper
from vargp_tpu.train.metrics import (
    compute_accuracy,
    compute_acc_ent,
    compute_bwt,
)
from vargp_tpu.train.loop import TrainHyperparams, train_task, make_update_fn, make_predict_fn

__all__ = [
    "EarlyStopper",
    "compute_accuracy",
    "compute_acc_ent",
    "compute_bwt",
    "TrainHyperparams",
    "train_task",
    "make_update_fn",
    "make_predict_fn",
]
