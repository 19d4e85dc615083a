"""Toy 2-D 4-cluster dataset (parity: var_gp/datasets.py:10-51).

Same generative recipe — four Gaussian clusters, 50 points each, classes
0..3, with the global shift X[:,1]-=1, X[:,0]-=0.5 — but with an explicit
numpy Generator instead of global torch RNG.
"""

import numpy as np

from vargp_tpu.data.core import ArrayDataset


def make_toy_dataset(seed: int = 0, n_per_class: int = 50) -> ArrayDataset:
    rng = np.random.default_rng(seed)
    n = n_per_class

    x1 = np.stack(
        [0.8 + 0.4 * rng.standard_normal(n), 1.5 + 0.4 * rng.standard_normal(n)],
        axis=-1,
    )
    x2 = np.stack(
        [0.5 + 0.6 * rng.standard_normal(n), -0.2 - 0.1 * rng.standard_normal(n)],
        axis=-1,
    )
    x3 = np.stack(
        [2.5 - 0.1 * rng.standard_normal(n), 1.0 + 0.6 * rng.standard_normal(n)],
        axis=-1,
    )
    cov = np.array([[0.2, 0.1], [0.1, 0.1]])
    x4 = rng.multivariate_normal([-0.5, 1.5], cov, size=n)

    X = np.concatenate([x1, x2, x3, x4], axis=0).astype(np.float32)
    X[:, 1] -= 1.0
    X[:, 0] -= 0.5
    Y = np.repeat(np.arange(4, dtype=np.int32), n)
    return ArrayDataset(X, Y)
