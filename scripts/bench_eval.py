"""Eval-path micro-benchmark: shared-theta vs per-batch-resampled hypers.

The reference re-samples kernel hypers for every predict() call
(var_gp/train_utils.py:24-28 loops predict over batches), so each eval
batch pays a fresh Gram + Cholesky of the full (sum M) chain.  Our eval
scan hoists build_posterior out of the batch loop by default
(train/loop.py::make_device_eval_fn, eval_resample_per_batch=False) —
the same MC estimator over a dataset-level hyper-sample budget.

This script measures both modes at notebook eval budgets (n_f=50,
n_var_samples=20; mnist.ipynb cell 12/21) on the bench workload shapes
(5-task chain, M=60, out=10, B=512) over a 20-batch (10,240-sample) eval
set, device-trace timed.

Usage: python scripts/bench_eval.py [--batches 20] [--iters 5]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--n_f", type=int, default=50)
    ap.add_argument("--n_v", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from vargp_tpu.train.loop import TrainHyperparams, make_device_eval_fn
    from vargp_tpu.utils.profiling import device_trace

    cfg, params, prev, prior, x, y, w, key = g._flagship()
    chain_mask = jnp.ones((len(prev),), jnp.float32)
    K = args.batches
    xs = jnp.broadcast_to(x[None], (K, *x.shape))
    ys = jnp.broadcast_to(y[None], (K, *y.shape))
    ws = jnp.broadcast_to(w[None], (K, *w.shape))

    results = {}
    for resample in (False, True):
        hp = TrainHyperparams(
            eval_n_f=args.n_f,
            eval_n_var_samples=args.n_v,
            eval_resample_per_batch=resample,
        )
        eval_fn = make_device_eval_fn(cfg, hp)
        correct, total = eval_fn(params, prev, chain_mask, xs, ys, ws, key)
        jax.block_until_ready((correct, total))
        with device_trace() as tr:
            for i in range(args.iters):
                k = jax.random.fold_in(key, i)
                out = eval_fn(params, prev, chain_mask, xs, ys, ws, k)
            jax.block_until_ready(out)
        ms = sum(tr["events"].values()) / args.iters
        label = "resample-per-batch (reference semantics)" if resample else \
            "shared-theta (default)"
        print(f"{label:45s} {ms:9.3f} ms / {K}-batch eval pass (device)")
        results[resample] = ms

    print(f"speedup: {results[True] / results[False]:.2f}x")


if __name__ == "__main__":
    main()
