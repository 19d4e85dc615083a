"""Split-Digits: a REAL-image continual benchmark available offline.

sklearn's bundled `load_digits` (1,797 genuine 8x8 handwritten digits,
10 classes — the UCI ML hand-written digits test set) stands in for MNIST
on zero-egress hosts: same Split-MNIST protocol (5 tasks x 2 classes,
classes-seen-so-far evaluation; reference: var_gp/datasets.py:70-106,
experiments/vargp.py:107-141) on real data, small enough that the torch
reference implementation can be trained on it for direct accuracy-parity
runs.

Deterministic stratified split; images scaled to [0,1] like MNIST
(datasets.py:75).
"""

import numpy as np

from vargp_tpu.data.core import ArrayDataset

_N_TEST_PER_CLASS = 36  # ~20% of ~180 per class -> 360 test samples


def _load_raw():
    from sklearn.datasets import load_digits

    X, y = load_digits(return_X_y=True)
    return (X / 16.0).astype(np.float32), y.astype(np.int32)


def load_digits_dataset(train: bool = True, seed: int = 0) -> ArrayDataset:
    """Stratified deterministic train/test split of the 1,797 digits."""
    X, y = _load_raw()
    rng = np.random.default_rng(seed)
    test_mask = np.zeros(len(y), dtype=bool)
    for c in range(10):
        idx = np.flatnonzero(y == c)
        test_mask[rng.permutation(idx)[:_N_TEST_PER_CLASS]] = True
    mask = ~test_mask if train else test_mask
    return ArrayDataset(X[mask], y[mask])
