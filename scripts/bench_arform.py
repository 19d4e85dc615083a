"""A/B the AR-posterior representation on real TPU hardware at production
shapes: sequential fold vs materialized block-LDL vs whitened factored.

Three regimes:
  - flagship (S-MNIST task 4): S=300 (5 x M=60) — currently the fold
  - S=1000 (P-MNIST late tasks): 10 x M=100 — fast/factored gate territory
  - M=1024 single task: T == 1 early-out (representation-independent;
    included as a control)

Usage: python scripts/bench_arform.py
Prints steps/s per (regime, form) using the production scanned train
block (same harness as bench.py, smaller step blocks).
"""

import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time

import jax
import jax.numpy as jnp

N = int(os.environ.get("VARGP_TPU_BENCH_STEPS", "50"))


def run(n_tasks, M, form, min_rows):
    os.environ["VARGP_TPU_AR_FORM"] = form
    import __graft_entry__ as g
    from vargp_tpu.models import vargp as V
    from vargp_tpu.train.loop import TrainHyperparams, make_device_train_fn, make_optimizer

    old_gate = V._FAST_CHAIN_MIN_ROWS
    V._FAST_CHAIN_MIN_ROWS = min_rows
    try:
        cfg, params, prev, prior, x, y, w, key = g._flagship(n_tasks=n_tasks, M=M)
        hp = TrainHyperparams(lr=3e-3, beta=10.0)
        tx = make_optimizer(hp)
        opt_state = tx.init(params)
        run_block = make_device_train_fn(
            cfg, tx, hp.beta, batch_size=x.shape[0], n_epochs=N
        )
        chain_mask = jnp.ones((len(prev),), jnp.float32)
        n_train = jnp.asarray(50000.0)
        params, opt_state, loss_val, _ = run_block(
            params, opt_state, prev, prior, chain_mask, n_train, x, y, w, key
        )
        warm_loss = float(loss_val)
        k2 = jax.random.fold_in(key, 1)
        k2.block_until_ready()
        t0 = time.time()
        params, opt_state, loss_val, _ = run_block(
            params, opt_state, prev, prior, chain_mask, n_train, x, y, w, k2
        )
        final = float(loss_val)
        dt = (time.time() - t0) / N
        return 1.0 / dt, final
    finally:
        V._FAST_CHAIN_MIN_ROWS = old_gate


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    REGIMES = [("flagship", 5, 60), ("s1000", 10, 100)]
    # (form, gate) triples: fold = gate above S so neither fast nor factored
    VARIANTS = [
        ("fold", "materialized", 10**9),
        ("materialized", "materialized", 1),
        ("factored", "factored", 1),
    ]
    for rname, n_tasks, M in REGIMES:
        for vname, form, gate in VARIANTS:
            sps, loss = run(n_tasks, M, form, gate)
            print(
                f"{rname:9s} {vname:12s} {sps:8.2f} steps/s  ({1e3/sps:7.3f} ms)  loss={loss:.4f}",
                flush=True,
            )
