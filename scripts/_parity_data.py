"""Shared data construction for the full-protocol surrogate parity runs.

Both sides of the parity experiment (scripts/ref_parity.py — live torch
reference; scripts/tpu_parity.py — vargp_tpu) call ``build_parity_data``
with the same arguments, so they train and evaluate on BYTE-IDENTICAL
numpy arrays.  Pure numpy: safe to import from a torch process that must
never touch the jax tree.

The subset exists because this host has ONE CPU core: the torch reference
at full 60k-row budgets would need >12 h.  A class-balanced subset keeps
the complete 5-task Split-MNIST protocol (experiments/vargp.py:107-140)
intact while making the reference run tractable; the vargp_tpu side uses
the SAME subset and budgets, so the comparison stays apples-to-apples.
"""

import numpy as np


def _load_surrogate_module():
    """Import vargp_tpu/data/mnist.py standalone (numpy only)."""
    import importlib.util
    import os
    import sys
    import types

    if "vargp_tpu.data.mnist" in sys.modules:
        return sys.modules["vargp_tpu.data.mnist"]

    path = os.path.join(
        os.path.dirname(__file__), "..", "vargp_tpu", "data", "mnist.py"
    )
    core = types.ModuleType("vargp_tpu.data.core")

    class ArrayDataset(tuple):
        def __new__(cls, data, targets):
            return super().__new__(cls, (data, targets))

        data = property(lambda s: s[0])
        targets = property(lambda s: s[1])

    core.ArrayDataset = ArrayDataset
    sys.modules.setdefault("vargp_tpu", types.ModuleType("vargp_tpu"))
    sys.modules.setdefault("vargp_tpu.data", types.ModuleType("vargp_tpu.data"))
    sys.modules.setdefault("vargp_tpu.data.core", core)
    spec = importlib.util.spec_from_file_location("_parity_mnist", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def build_parity_data(
    rows_train: int = 1250,
    rows_val: int = 250,
    rows_test: int = 500,
    seed: int = 42,
):
    """Class-balanced surrogate subset.

    Returns dict with float32 X / int64 y for train/val/test.  The
    train/val split mirrors the protocol's held-out validation
    (experiments/vargp.py:122-125) at subset scale; test rows come from
    the surrogate's test split.
    """
    vm = _load_surrogate_module()
    full = vm._synthetic_mnist(True)
    test = vm._synthetic_mnist(False)
    Xf, yf = np.asarray(full.data), np.asarray(full.targets)
    Xt, yt = np.asarray(test.data), np.asarray(test.targets)

    rng = np.random.default_rng(seed)
    tr_idx, va_idx, te_idx = [], [], []
    for c in range(10):
        idx = rng.permutation(np.flatnonzero(yf == c))
        tr_idx.append(idx[:rows_train])
        va_idx.append(idx[rows_train : rows_train + rows_val])
        tidx = rng.permutation(np.flatnonzero(yt == c))
        te_idx.append(tidx[:rows_test])
    tr_idx = np.concatenate(tr_idx)
    va_idx = np.concatenate(va_idx)
    te_idx = np.concatenate(te_idx)
    return dict(
        X_train=Xf[tr_idx].astype(np.float32),
        y_train=yf[tr_idx].astype(np.int64),
        X_val=Xf[va_idx].astype(np.float32),
        y_val=yf[va_idx].astype(np.int64),
        X_test=Xt[te_idx].astype(np.float32),
        y_test=yt[te_idx].astype(np.int64),
    )


def bwt(acc_matrix: np.ndarray) -> float:
    """Backward transfer (train_utils.py:59-66): mean(last row - diagonal),
    excluding the final task."""
    A = np.asarray(acc_matrix)
    T = A.shape[0]
    return float(np.mean(A[T - 1, : T - 1] - np.diag(A)[: T - 1]))
