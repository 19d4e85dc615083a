"""Continual-learning task-stream transforms.

Parity: var_gp/datasets.py filter_by_class :53-61/:79-87, filter_by_idx
:89-92, PermutedMNIST.create_tasks/set_task :108-124 — as pure functions on
ArrayDataset instead of mutating dataset objects.
"""

import numpy as np

from vargp_tpu.data.core import ArrayDataset


def filter_by_class(ds: ArrayDataset, class_list=None) -> ArrayDataset:
    """Keep rows whose target is in class_list (None/empty keeps all)."""
    if not class_list:
        return ds
    mask = np.isin(ds.targets, np.asarray(list(class_list)))
    return ds.select(np.flatnonzero(mask))


def split_train_val(
    ds: ArrayDataset, n_val: int, rng: np.random.Generator
) -> tuple[ArrayDataset, ArrayDataset]:
    """Random train/val split (parity: experiments/vargp.py:122-125 —
    10k-row validation split of MNIST train).  n_val=0 means no validation
    rows (idx[:-0] would instead empty the TRAIN set)."""
    idx = rng.permutation(len(ds))
    cut = len(idx) - n_val
    return ds.select(idx[:cut]), ds.select(idx[cut:])


def make_permutations(n_tasks: int, dim: int, rng: np.random.Generator):
    """Pixel permutations per task; task 0 is the identity (parity:
    experiments/vargp.py:154-155)."""
    perms = [np.arange(dim)]
    perms += [rng.permutation(dim) for _ in range(n_tasks - 1)]
    return perms


def apply_permutation(ds: ArrayDataset, perm: np.ndarray) -> ArrayDataset:
    return ArrayDataset(ds.data[:, perm], ds.targets)


def concat(datasets) -> ArrayDataset:
    return ArrayDataset(
        np.concatenate([d.data for d in datasets], axis=0),
        np.concatenate([d.targets for d in datasets], axis=0),
    )
