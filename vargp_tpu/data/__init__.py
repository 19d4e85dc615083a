"""Task-stream data layer (torch-free, array-based).

Parity: var_gp/datasets.py — ToyDataset (4 Gaussian clusters), SplitMNIST,
PermutedMNIST — re-designed as immutable numpy array datasets with
functional filters, plus a static-shape padded batcher (TPU jit wants fixed
shapes; partial trailing minibatches are padded + zero-weighted instead of
recompiling).
"""

from vargp_tpu.data.core import ArrayDataset, batch_iter, eval_batches
from vargp_tpu.data.toy import make_toy_dataset
from vargp_tpu.data.digits import load_digits_dataset
from vargp_tpu.data.mnist import load_mnist, mnist_available, mnist_source
from vargp_tpu.data.tasks import (
    filter_by_class,
    split_train_val,
    make_permutations,
    apply_permutation,
)

__all__ = [
    "ArrayDataset",
    "batch_iter",
    "eval_batches",
    "make_toy_dataset",
    "load_digits_dataset",
    "load_mnist",
    "mnist_available",
    "mnist_source",
    "filter_by_class",
    "split_train_val",
    "make_permutations",
    "apply_permutation",
]
