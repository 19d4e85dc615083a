"""Train the upstream PyTorch reference on Split-Digits for accuracy parity.

Runs the reference VARGP (imported live from /root/reference, never copied)
under the Split-MNIST protocol (experiments/vargp.py:14-73,107-141) on the
same deterministic Split-Digits splits as `python -m vargp_tpu s_digits`,
then evaluates the T x T accuracy matrix with notebook MC budgets
(mnist.ipynb cell 12).  Output: results/ref_sdigits.json.

This is the direct "accuracy within 0.5%" parity evidence on REAL image
data available to a zero-egress host (BASELINE.md north star).

Usage: python scripts/ref_digits.py [--epochs 500] [--seed 0]
"""

import argparse
import copy
import json
import os
import sys
import time

REFERENCE_DIR = "/root/reference"
sys.path.insert(0, REFERENCE_DIR)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

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


def _load_digits_module():
    """Load vargp_tpu/data/digits.py standalone (numpy+sklearn only) so this
    torch process never imports the jax package tree."""
    import importlib.util

    path = os.path.join(
        os.path.dirname(__file__), "..", "vargp_tpu", "data", "digits.py"
    )
    # digits.py only needs ArrayDataset from .core; give it a tiny shim
    import types

    core = types.ModuleType("vargp_tpu.data.core")

    class ArrayDataset(tuple):
        def __new__(cls, data, targets):
            return super().__new__(cls, (data, targets))

        data = property(lambda s: s[0])
        targets = property(lambda s: s[1])

    core.ArrayDataset = ArrayDataset
    pkg = types.ModuleType("vargp_tpu")
    datapkg = types.ModuleType("vargp_tpu.data")
    sys.modules.setdefault("vargp_tpu", pkg)
    sys.modules["vargp_tpu.data"] = datapkg
    sys.modules["vargp_tpu.data.core"] = core
    spec = importlib.util.spec_from_file_location("_vdigits", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


vdig = _load_digits_module()


class _TensorTaskData(torch.utils.data.Dataset):
    """Torch dataset with the reference's filter semantics
    (var_gp/datasets.py:70-106): `targets` stays FULL (so create_clf's
    torch.unique sees all 10 classes -> out_size=10) and filtering only
    masks `task_ids`."""

    def __init__(self, X, y, task_ids=None):
        self.data = torch.tensor(np.ascontiguousarray(X))
        self.targets = torch.tensor(np.ascontiguousarray(y), dtype=torch.long)
        self.task_ids = (
            torch.arange(len(self.targets)) if task_ids is None else task_ids
        )

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


def train_task(
    task_id, train_ds, val_ds, test_ds, prev_params, *, M, epochs, lr, beta,
    batch_size, n_f, n_v, patience, eval_interval, dkl=False,
):
    """One task of the reference protocol: create_clf, Adam, ELBO
    beta*kl_hypers + kl_u + (N/B)*lik, eval-every-10, early stop on val."""
    # create_clf pops kernel.* keys from prev_params IN PLACE
    # (vargp.py:223-229) — pass copies so the stored chain stays intact
    gp = VARGP.create_clf(
        train_ds, M=M, n_f=n_f, n_var_samples=n_v,
        prev_params=[copy.deepcopy(p) for p in prev_params], dkl=dkl,
    )
    optim = torch.optim.Adam(gp.parameters(), lr=lr)
    N = len(train_ds)
    loader = torch.utils.data.DataLoader(
        train_ds, batch_size=batch_size, shuffle=True
    )
    best = dict(val=-1.0, state=None, accs=None, since=0)
    for e in range(epochs):
        for x, y in loader:
            optim.zero_grad()
            kl_hypers, kl_u, lik = gp.loss(x, y)
            loss = beta * kl_hypers + kl_u + (N / x.size(0)) * lik
            loss.backward()
            optim.step()
        if (e + 1) % eval_interval == 0:
            accs = {
                "train": accuracy(gp, train_ds),
                "val": accuracy(gp, val_ds),
                "test": accuracy(gp, test_ds),
            }
            if accs["val"] > best["val"] + 1e-4:
                best = dict(
                    val=accs["val"],
                    state=copy.deepcopy(gp.state_dict()),
                    accs=accs,
                    since=0,
                )
            else:
                best["since"] += 1
                if patience >= 0 and best["since"] >= patience:
                    break
    print(f"[ref s_digits] task {task_id}: {best['accs']}")
    return best["state"], best["accs"]


def eval_matrix(chain, test_sets, *, M, n_f, n_v, dkl=False):
    """T x T accuracy matrix via the notebook chain-reload protocol
    (mnist.ipynb cell 12)."""
    T = len(chain)
    acc = np.zeros((T, T))
    dummy = _TensorTaskData(
        np.zeros((max(M, 10) * 10, 64), np.float32),
        np.tile(np.arange(10), max(M, 10)),
    )
    for t in range(T):
        gp = VARGP.create_clf(
            dummy, M=M, n_f=n_f, n_var_samples=n_v,
            prev_params=[copy.deepcopy(p) for p in chain[:t]], dkl=dkl,
        )
        gp.load_state_dict(chain[t])
        for s, ds in enumerate(test_sets):
            acc[t, s] = accuracy(gp, ds) if s <= t else 0.0
    return acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=500)
    ap.add_argument("--M", type=int, default=20)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--beta", type=float, default=10.0)
    ap.add_argument("--batch_size", type=int, default=512)
    ap.add_argument("--patience", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dkl", action="store_true")
    ap.add_argument("--n_tasks", type=int, default=5)
    ap.add_argument("--eval_nf", type=int, default=50)
    ap.add_argument("--eval_nv", type=int, default=20)
    ap.add_argument("--out", default="results/ref_sdigits.json")
    args = ap.parse_args()

    torch.manual_seed(args.seed)
    np.random.seed(args.seed)

    # identical splits to `python -m vargp_tpu s_digits` (seed=0 split;
    # driver-side val split uses default_rng(seed))
    train_full = vdig.load_digits_dataset(train=True, seed=0)
    test_full = vdig.load_digits_dataset(train=False, seed=0)
    rng = np.random.default_rng(args.seed)
    perm = rng.permutation(len(train_full.targets))
    n_val = len(train_full.targets) // 5
    val_idx, train_idx = perm[:n_val], perm[n_val:]
    train_all = _TensorTaskData(
        train_full.data[train_idx], train_full.targets[train_idx]
    )
    val_all = _TensorTaskData(train_full.data[val_idx], train_full.targets[val_idx])
    test_all = _TensorTaskData(test_full.data, test_full.targets)

    t0 = time.time()
    chain, summaries = [], []
    for t in range(args.n_tasks):
        train_ds = train_all.filter_classes([2 * t, 2 * t + 1])
        val_ds = val_all.filter_classes(range(2 * t + 2))
        test_ds = test_all.filter_classes(range(2 * t + 2))
        state, accs = train_task(
            t, train_ds, val_ds, test_ds, chain,
            M=args.M, epochs=args.epochs, lr=args.lr, beta=args.beta,
            batch_size=args.batch_size, n_f=10, n_v=3,
            patience=args.patience, eval_interval=10, dkl=args.dkl,
        )
        chain.append(state)
        summaries.append(accs)

    test_sets = [
        test_all.filter_classes([2 * t, 2 * t + 1]) for t in range(args.n_tasks)
    ]
    acc = eval_matrix(chain, test_sets, M=args.M, n_f=args.eval_nf, n_v=args.eval_nv, dkl=args.dkl)
    T = args.n_tasks
    bwt = float(np.mean(acc[-1, : T - 1] - np.diag(acc)[: T - 1]))
    out = dict(
        final_accs=acc[-1].tolist(),
        final_avg_acc=float(acc[-1].mean()),
        bwt=bwt,
        acc_matrix=acc.tolist(),
        wall_time_s=time.time() - t0,
        config=vars(args),
        task_summaries=summaries,
    )
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "acc_matrix"}))


if __name__ == "__main__":
    main()
