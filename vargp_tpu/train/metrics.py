"""Evaluation metrics (parity: var_gp/train_utils.py:21-66).

``predict_fn(x) -> (B, out) probabilities`` is any jitted predictor; the
helpers stream fixed-shape padded batches and mask padding, matching the
reference's DataLoader-based loops with NaN guards.
"""

import numpy as np

from vargp_tpu.data.core import ArrayDataset, eval_batches


def compute_accuracy(ds: ArrayDataset, predict_fn, batch_size: int = 512) -> float:
    """Top-1 accuracy with a NaN guard (train_utils.py:21-35)."""
    count = 0
    for b in eval_batches(ds, batch_size):
        probs = np.asarray(predict_fn(b.x))
        assert not np.isnan(probs).any(), "Found NaNs"
        hits = (probs.argmax(axis=-1) == b.y) & (b.w > 0)
        count += int(hits.sum())
    return count / len(ds)


def compute_acc_ent(ds: ArrayDataset, predict_fn, batch_size: int = 512):
    """Accuracy + mean predictive entropy (train_utils.py:38-56)."""
    total_corr = 0
    total_ent = 0.0
    for b in eval_batches(ds, batch_size):
        probs = np.asarray(predict_fn(b.x))
        assert not np.isnan(probs).any(), "Found NaNs"
        hits = (probs.argmax(axis=-1) == b.y) & (b.w > 0)
        total_corr += int(hits.sum())
        ent = -np.sum(np.where(probs > 0, probs * np.log(probs), 0.0), axis=-1)
        total_ent += float((ent * b.w).sum())
    n = len(ds)
    return total_corr / n, total_ent / n


def compute_bwt(acc_mat: np.ndarray) -> float:
    """Backward transfer: mean(last row - diagonal), excluding the final task
    (train_utils.py:59-65)."""
    acc_mat = np.asarray(acc_mat)
    assert acc_mat.ndim == 2 and acc_mat.shape[0] == acc_mat.shape[1]
    return float((acc_mat[-1][:-1] - np.diagonal(acc_mat)[:-1]).mean())
