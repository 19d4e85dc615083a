"""FULL-PROTOCOL vargp_tpu run on the surrogate parity subset.

The vargp_tpu half of the round-3 parity experiment (VERDICT r2,
Missing #1 / Next #2): trains on BYTE-IDENTICAL data to
scripts/ref_parity.py (the live torch reference) with matching budgets —
epochs=300, M=60, lr=3e-3, beta=10, batch 512, eval every 10 epochs,
patience 10 evals on seen-classes validation accuracy — through the
complete 5-task Split-MNIST protocol (reference:
experiments/vargp.py:107-140), then the chain-reload analysis
(mnist.ipynb cell 12: rebuild model t from ckpt0..ckpt_t at n_f=50,
n_var_samples=20 and evaluate every per-task test split).

Output: results/parity_tpu/analysis.json with the TxT accuracy +
normalized-entropy matrices and BWT, directly comparable to
results/parity_ref/analysis.json.

Usage: python scripts/tpu_parity.py --out_dir results/parity_tpu
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np

from _parity_data import build_parity_data, bwt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--M", type=int, default=60)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--beta", type=float, default=10.0)
    ap.add_argument("--batch_size", type=int, default=512)
    ap.add_argument("--eval_interval", type=int, default=10)
    ap.add_argument("--patience", type=int, default=10)
    ap.add_argument("--n_tasks", type=int, default=5)
    ap.add_argument("--rows_train", type=int, default=1250)
    ap.add_argument("--rows_val", type=int, default=250)
    ap.add_argument("--rows_test", type=int, default=500)
    ap.add_argument("--data_seed", type=int, default=42)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval_n_f", type=int, default=50)
    ap.add_argument("--eval_n_var", type=int, default=20)
    ap.add_argument("--out_dir", default="results/parity_tpu")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vargp_tpu.data.core import ArrayDataset
    from vargp_tpu.data.tasks import filter_by_class
    from vargp_tpu.experiments.analysis import (
        accuracy_entropy_matrices,
        load_task_chain,
        summarize,
    )
    from vargp_tpu.experiments.vargp_run import _run_task_stream
    from vargp_tpu.models import vargp as V
    from vargp_tpu.train.loop import TrainHyperparams

    d = build_parity_data(
        args.rows_train, args.rows_val, args.rows_test, args.data_seed
    )
    train_all = ArrayDataset(d["X_train"], d["y_train"])
    val_all = ArrayDataset(d["X_val"], d["y_val"])
    test_all = ArrayDataset(d["X_test"], d["y_test"])

    def tasks():
        for t in range(args.n_tasks):
            train_set = filter_by_class(train_all, [2 * t, 2 * t + 1])
            val_set = filter_by_class(val_all, range(2 * t + 2))
            test_set = filter_by_class(test_all, range(2 * t + 2))
            yield train_set, val_set, test_set

    cfg = V.VARGPConfig(
        M=args.M, out_size=10, in_size=train_all.in_size, n_f=10,
        n_var_samples=3, ep_var_mean=True,
    )
    counts = np.bincount(train_all.targets, minlength=2 * args.n_tasks)
    max_train = int(
        max(counts[2 * t] + counts[2 * t + 1] for t in range(args.n_tasks))
    )
    max_eval_rows = max(max_train, len(val_all), len(test_all))
    hp = TrainHyperparams(
        epochs=args.epochs, lr=args.lr, batch_size=args.batch_size,
        beta=args.beta, eval_interval=args.eval_interval,
        patience=args.patience, pad_tasks_to=args.n_tasks,
        pad_data_rows=max_train,
        pad_eval_batches=-(-max_eval_rows // args.batch_size),
    )
    meta = {
        "protocol": "parity-subset full 5-task Split-MNIST",
        "data": f"build_parity_data({args.rows_train},{args.rows_val},"
        f"{args.rows_test},seed={args.data_seed})",
        "budgets": f"epochs={args.epochs} M={args.M} lr={args.lr} "
        f"beta={args.beta} bs={args.batch_size} "
        f"ev={args.eval_interval} pat={args.patience}",
    }
    chain, summaries = _run_task_stream(
        "parity_tpu", tasks(), cfg, hp, args.seed, args.out_dir, meta=meta
    )

    # chain-reload analysis at eval MC budgets on per-task test splits
    key = jax.random.key(0)
    z = jnp.zeros((cfg.out_size, cfg.M, cfg.in_size))
    example, _ = V.init_params(key, z, cfg)
    chain = load_task_chain(args.out_dir, args.n_tasks, example)
    test_sets = [
        filter_by_class(test_all, [2 * t, 2 * t + 1])
        for t in range(args.n_tasks)
    ]
    acc, ent = accuracy_entropy_matrices(
        chain, cfg, test_sets, n_f=args.eval_n_f,
        n_var_samples=args.eval_n_var,
    )
    summary = summarize(acc, ent)
    summary["bwt_check"] = bwt(np.asarray(summary["acc_matrix"]))
    with open(os.path.join(args.out_dir, "analysis.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if "matrix" not in k}))


if __name__ == "__main__":
    main()
