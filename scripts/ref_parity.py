"""FULL-PROTOCOL torch-reference run on the surrogate parity subset.

Closes the round-2 evidence hole (VERDICT r2, Missing #1): the surrogate
was previously validated against the live reference only for
*trainability*.  This script runs the upstream reference VARGP (imported
live from /root/reference — never copied) through the COMPLETE 5-task
Split-MNIST protocol (experiments/vargp.py:107-140):

  - per task t: train on classes {2t, 2t+1}, early-stop on validation
    accuracy over classes seen so far, keep the best state_dict;
  - chain-reload analysis (notebooks/mnist.ipynb cell 12): rebuild model t
    from [ckpt0..ckpt_{t-1}] + ckpt_t at eval MC budgets (n_f=50,
    n_var_samples=20) and evaluate every per-task test split -> TxT
    accuracy + normalized-entropy matrices + BWT.

Data: the class-balanced surrogate subset from scripts/_parity_data.py —
byte-identical to what scripts/tpu_parity.py trains vargp_tpu on.
Optimizer: Adam on BOTH sides (torch_optimizer.Yogi is not installed in
this image; the reference keeps Adam as the commented-out alternative at
experiments/vargp.py:22).

Single-CPU-core host: expect hours.  Progress/checkpoints stream into
--out_dir so partial results survive interruption.

Usage: python scripts/ref_parity.py --out_dir results/parity_ref
"""

import argparse
import copy
import json
import math
import os
import sys
import time

REFERENCE_DIR = "/root/reference"
sys.path.insert(0, REFERENCE_DIR)
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import torch
import torch.nn.functional as TF

# torch-2.x compat shims for the 2021-era reference (no math change)
def _patched_trsolve(b, A, upper=True, transpose=False, unitriangular=False):
    sol = torch.linalg.solve_triangular(A.contiguous(), b, upper=upper)
    return sol, A


torch.triangular_solve = _patched_trsolve
_orig_nll = TF.nll_loss
TF.nll_loss = lambda input, target, *a, **k: _orig_nll(
    input.contiguous(), target, *a, **k
)

from _parity_data import build_parity_data, bwt  # noqa: E402
from var_gp.vargp import VARGP  # noqa: E402


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
def acc_ent(gp, ds, batch_size=512):
    """Accuracy + normalized predictive entropy (train_utils.py:38-57)."""
    xs = ds.data[ds.task_ids]
    ys = ds.targets[ds.task_ids]
    hits, ent_sum = 0, 0.0
    for i in range(0, len(ds), batch_size):
        probs = gp.predict(xs[i : i + batch_size])
        assert not torch.isnan(probs).any()
        hits += (probs.argmax(-1) == ys[i : i + batch_size]).sum().item()
        e = torch.distributions.Categorical(probs=probs).entropy()
        ent_sum += (e / math.log(10.0)).sum().item()
    return hits / len(ds), ent_sum / len(ds)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--M", type=int, default=60)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--beta", type=float, default=10.0)
    ap.add_argument("--batch_size", type=int, default=512)
    ap.add_argument("--eval_interval", type=int, default=10)
    ap.add_argument("--patience", type=int, default=10, help="evals w/o improvement")
    ap.add_argument("--n_tasks", type=int, default=5)
    ap.add_argument("--rows_train", type=int, default=1250)
    ap.add_argument("--rows_val", type=int, default=250)
    ap.add_argument("--rows_test", type=int, default=500)
    ap.add_argument("--data_seed", type=int, default=42)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval_n_f", type=int, default=50)
    ap.add_argument("--eval_n_var", type=int, default=20)
    ap.add_argument("--out_dir", default="results/parity_ref")
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    torch.manual_seed(args.seed)
    np.random.seed(args.seed)

    d = build_parity_data(args.rows_train, args.rows_val, args.rows_test, args.data_seed)
    train_all = _TensorTaskData(d["X_train"], d["y_train"])
    val_all = _TensorTaskData(d["X_val"], d["y_val"])
    test_all = _TensorTaskData(d["X_test"], d["y_test"])

    t0 = time.time()
    chain, summaries = [], []
    for t in range(args.n_tasks):
        train_ds = train_all.filter_classes([2 * t, 2 * t + 1])
        val_ds = val_all.filter_classes(range(2 * t + 2))
        gp = VARGP.create_clf(
            train_ds, M=args.M, n_f=10, n_var_samples=3,
            prev_params=[copy.deepcopy(p) for p in chain],
        )
        optim = torch.optim.Adam(gp.parameters(), lr=args.lr)
        N = len(train_ds)
        loader = torch.utils.data.DataLoader(
            train_ds, batch_size=args.batch_size, shuffle=True
        )
        best = dict(val=-1.0, state=None, epoch=0, since=0)
        for e in range(args.epochs):
            for xb, yb in loader:
                optim.zero_grad()
                kl_hypers, kl_u, lik = gp.loss(xb, yb)
                loss = args.beta * kl_hypers + kl_u + (N / xb.size(0)) * lik
                loss.backward()
                optim.step()
            if (e + 1) % args.eval_interval == 0:
                val_acc, _ = acc_ent(gp, val_ds, args.batch_size)
                print(
                    f"[ref parity] task {t} e{e+1}: val={val_acc:.4f}"
                    f" (best {best['val']:.4f} @{best['epoch']})"
                    f" {time.time()-t0:.0f}s",
                    flush=True,
                )
                if val_acc > best["val"] + 1e-4:
                    best = dict(
                        val=val_acc, state=copy.deepcopy(gp.state_dict()),
                        epoch=e + 1, since=0,
                    )
                else:
                    best["since"] += 1
                    if args.patience >= 0 and best["since"] >= args.patience:
                        break
        chain.append(best["state"])
        torch.save(best["state"], os.path.join(args.out_dir, f"ckpt{t}.pt"))
        summaries.append(dict(task=t, best_val=best["val"], best_epoch=best["epoch"]))
        with open(os.path.join(args.out_dir, "progress.json"), "w") as f:
            json.dump(dict(summaries=summaries, wall_s=time.time() - t0), f, indent=2)
        print(f"[ref parity] task {t} done: {summaries[-1]}", flush=True)

    # ---- chain-reload analysis (mnist.ipynb cell 12 protocol) ----
    T = args.n_tasks
    acc_m = np.zeros((T, T))
    ent_m = np.zeros((T, T))
    train0 = train_all.filter_classes([0, 1])  # create_clf needs a dataset for z init
    for t in range(T):
        gp = VARGP.create_clf(
            train0, M=args.M, n_f=args.eval_n_f, n_var_samples=args.eval_n_var,
            prev_params=[copy.deepcopy(p) for p in chain[:t]],
        )
        gp.load_state_dict(chain[t])
        for tau in range(T):
            test_ds = test_all.filter_classes([2 * tau, 2 * tau + 1])
            a, en = acc_ent(gp, test_ds, args.batch_size)
            acc_m[t, tau] = a if tau <= t else 0.0
            ent_m[t, tau] = en
        print(f"[ref parity] matrix row {t}: {acc_m[t].round(4).tolist()}", flush=True)

    out = dict(
        config=vars(args),
        optimizer="adam",
        task_summaries=summaries,
        acc_matrix=acc_m.tolist(),
        ent_matrix=ent_m.tolist(),
        final_accs=acc_m[T - 1].tolist(),
        final_avg_acc=float(acc_m[T - 1].mean()),
        bwt=bwt(acc_m),
        wall_time_s=time.time() - t0,
    )
    with open(os.path.join(args.out_dir, "analysis.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(dict(final_avg_acc=out["final_avg_acc"], bwt=out["bwt"])))


if __name__ == "__main__":
    main()
