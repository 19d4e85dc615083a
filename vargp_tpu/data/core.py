"""Array dataset + static-shape batching.

The reference uses torch Datasets/DataLoaders (var_gp/datasets.py,
experiments/vargp.py:26).  Here a dataset is an immutable pair of numpy
arrays; batching yields fixed-shape (x, y, weights) triples where the last
partial minibatch is padded and zero-weighted — one compiled program per
batch size, the TPU way.

A native C++ fast path for shuffling/gathering large datasets lives in
``vargp_tpu.data.loader`` and is used automatically when built.
"""

from typing import Iterator, NamedTuple

import numpy as np


class ArrayDataset(NamedTuple):
    data: np.ndarray  # (N, D) float32
    targets: np.ndarray  # (N,) int32

    def __len__(self) -> int:
        return self.data.shape[0]

    @property
    def in_size(self) -> int:
        return self.data.shape[1]

    def num_classes(self) -> int:
        return int(np.unique(self.targets).size)

    def select(self, idx: np.ndarray) -> "ArrayDataset":
        return ArrayDataset(self.data[idx], self.targets[idx])


class Batch(NamedTuple):
    x: np.ndarray  # (B, D)
    y: np.ndarray  # (B,)
    w: np.ndarray  # (B,) 1.0 for real rows, 0.0 for padding


def _gather(ds: ArrayDataset, order: np.ndarray):
    try:
        from vargp_tpu.data.loader import native_gather

        return native_gather(ds.data, ds.targets, order)
    except Exception:
        return ds.data[order], ds.targets[order]


def batch_iter(
    ds: ArrayDataset,
    batch_size: int,
    rng: np.random.Generator | None = None,
    shuffle: bool = True,
) -> Iterator[Batch]:
    """Shuffled fixed-shape minibatches covering the whole dataset; the final
    partial batch is padded (repeating row 0) with zero weights."""
    n = len(ds)
    order = (rng or np.random.default_rng()).permutation(n) if shuffle else np.arange(n)
    data, targets = _gather(ds, order)
    for start in range(0, n, batch_size):
        stop = min(start + batch_size, n)
        k = stop - start
        if k == batch_size:
            yield Batch(
                data[start:stop], targets[start:stop],
                np.ones(batch_size, dtype=np.float32),
            )
        else:
            x = np.zeros((batch_size, data.shape[1]), dtype=data.dtype)
            y = np.zeros((batch_size,), dtype=targets.dtype)
            w = np.zeros((batch_size,), dtype=np.float32)
            x[:k], y[:k], w[:k] = data[start:stop], targets[start:stop], 1.0
            yield Batch(x, y, w)


def eval_batches(ds: ArrayDataset, batch_size: int) -> Iterator[Batch]:
    """Deterministic fixed-shape batches for evaluation."""
    yield from batch_iter(ds, batch_size, shuffle=False)
