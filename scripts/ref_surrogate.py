"""Validate the synthetic-MNIST surrogate is trainable by the torch reference.

The surrogate (vargp_tpu/data/mnist.py:_synthetic_mnist) stands in for real
MNIST on zero-egress hosts; VERDICT r1 requires it be "calibrated to
reference-run accuracy on a reference-trainable subset".  This script runs
the upstream reference VARGP (imported live from /root/reference, never
copied; protocol experiments/vargp.py:14-73,107-141) on a class-balanced
subset of the surrogate and reports per-task accuracies — evidence that the
surrogate's distance scale keeps the reference's RBF kernel out of the
dead-Gram regime at its default initialization (kernels.py:14-16).

Reduced budgets (subset rows, M=20, fewer epochs) keep the CPU run
tractable; the claim being validated is *trainability*, not the full
benchmark.  Output: results/ref_surrogate.json.

Usage: python scripts/ref_surrogate.py [--n_tasks 3] [--epochs 80]
"""

import argparse
import copy
import json
import os
import sys
import time

REFERENCE_DIR = "/root/reference"
sys.path.insert(0, REFERENCE_DIR)

import numpy as np
import torch
import torch.nn.functional as TF

# torch-2.x compat shims for the 2021-era reference (same as
# bench_baseline.py — no math change)
def _patched_trsolve(b, A, upper=True, transpose=False, unitriangular=False):
    sol = torch.linalg.solve_triangular(A.contiguous(), b, upper=upper)
    return sol, A


torch.triangular_solve = _patched_trsolve
_orig_nll = TF.nll_loss
TF.nll_loss = lambda input, target, *a, **k: _orig_nll(
    input.contiguous(), target, *a, **k
)

from var_gp.vargp import VARGP  # noqa: E402


def _load_surrogate():
    """Load vargp_tpu/data/mnist.py standalone (numpy only) so this torch
    process never imports the jax package tree."""
    import importlib.util
    import types

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
    sys.modules["vargp_tpu.data"] = types.ModuleType("vargp_tpu.data")
    sys.modules["vargp_tpu.data.core"] = core
    spec = importlib.util.spec_from_file_location("_vmnist", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _TensorTaskData(torch.utils.data.Dataset):
    """Reference filter semantics (var_gp/datasets.py:70-106): `targets`
    stays FULL (create_clf's torch.unique sees all classes) and filtering
    only masks `task_ids`."""

    def __init__(self, X, y):
        self.data = torch.tensor(np.ascontiguousarray(X))
        self.targets = torch.tensor(np.ascontiguousarray(y), dtype=torch.long)
        self.task_ids = torch.arange(len(self.targets))

    def filter_classes(self, classes):
        mask = torch.zeros_like(self.targets).bool()
        for c in classes:
            mask |= self.targets == c
        ids = torch.masked_select(torch.arange(self.targets.size(0)), mask)
        out = _TensorTaskData.__new__(_TensorTaskData)
        out.data, out.targets, out.task_ids = self.data, self.targets, ids
        return out

    def __len__(self):
        return self.task_ids.size(0)

    def __getitem__(self, i):
        return self.data[self.task_ids[i]], self.targets[self.task_ids[i]]


@torch.no_grad()
def accuracy(gp, ds, batch_size=512):
    xs = ds.data[ds.task_ids]
    ys = ds.targets[ds.task_ids]
    hits = 0
    for i in range(0, len(ds), batch_size):
        preds = gp.predict(xs[i : i + batch_size])
        assert not torch.isnan(preds).any()
        hits += (preds.argmax(-1) == ys[i : i + batch_size]).sum().item()
    return hits / len(ds)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--M", type=int, default=20)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--beta", type=float, default=10.0)
    ap.add_argument("--batch_size", type=int, default=512)
    ap.add_argument("--patience", type=int, default=8)
    ap.add_argument("--rows_per_class", type=int, default=1200)
    ap.add_argument("--n_tasks", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="results/ref_surrogate.json")
    args = ap.parse_args()

    torch.manual_seed(args.seed)
    np.random.seed(args.seed)

    vm = _load_surrogate()
    full = vm._synthetic_mnist(True)
    test = vm._synthetic_mnist(False)
    X, y = np.asarray(full.data), np.asarray(full.targets)

    # class-balanced subset; last 200/class of the subset -> validation
    rng = np.random.default_rng(args.seed)
    tr_idx, va_idx = [], []
    for c in range(10):
        idx = rng.permutation(np.flatnonzero(y == c))[: args.rows_per_class]
        va_idx.append(idx[-200:])
        tr_idx.append(idx[:-200])
    tr_idx, va_idx = np.concatenate(tr_idx), np.concatenate(va_idx)
    train_all = _TensorTaskData(X[tr_idx], y[tr_idx])
    val_all = _TensorTaskData(X[va_idx], y[va_idx])
    test_all = _TensorTaskData(np.asarray(test.data), np.asarray(test.targets))

    t0 = time.time()
    chain, summaries = [], []
    for t in range(args.n_tasks):
        train_ds = train_all.filter_classes([2 * t, 2 * t + 1])
        val_ds = val_all.filter_classes(range(2 * t + 2))
        test_ds = test_all.filter_classes(range(2 * t + 2))
        gp = VARGP.create_clf(
            train_ds, M=args.M, n_f=10, n_var_samples=3,
            prev_params=[copy.deepcopy(p) for p in chain],
        )
        optim = torch.optim.Adam(gp.parameters(), lr=args.lr)
        N = len(train_ds)
        loader = torch.utils.data.DataLoader(
            train_ds, batch_size=args.batch_size, shuffle=True
        )
        best = dict(val=-1.0, state=None, accs=None, since=0)
        for e in range(args.epochs):
            for xb, yb in loader:
                optim.zero_grad()
                kl_hypers, kl_u, lik = gp.loss(xb, yb)
                loss = args.beta * kl_hypers + kl_u + (N / xb.size(0)) * lik
                loss.backward()
                optim.step()
            if (e + 1) % 10 == 0:
                accs = dict(
                    epoch=e + 1,
                    train=accuracy(gp, train_ds),
                    val=accuracy(gp, val_ds),
                    test=accuracy(gp, test_ds),
                )
                print(f"[ref surrogate] task {t} e{e+1}: {accs}", flush=True)
                if accs["val"] > best["val"] + 1e-4:
                    best = dict(
                        val=accs["val"],
                        state=copy.deepcopy(gp.state_dict()),
                        accs=accs,
                        since=0,
                    )
                else:
                    best["since"] += 1
                    if args.patience >= 0 and best["since"] >= args.patience:
                        break
        chain.append(best["state"])
        summaries.append(best["accs"])

    out = dict(
        task_summaries=summaries,
        wall_time_s=time.time() - t0,
        config=vars(args),
        trainable=bool(
            summaries and all(s and s["val"] > 0.8 for s in summaries)
        ),
    )
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
