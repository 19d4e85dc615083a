"""Profile the flagship ELBO training step: per-op device-time breakdown.

Captures an XLA trace of the benchmark workload (bench.py shapes: 5-task
chain, M=60, out=10, B=512) and prints the top per-op device times — the
ground truth for ROADMAP perf work (wall clocks through the TPU tunnel are
unreliable for sub-ms claims).

Usage: python scripts/profile_step.py [--steps 20] [--top 25]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--block", type=int, default=10, help="updates per dispatch")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from vargp_tpu.train.loop import TrainHyperparams, make_device_train_fn, make_optimizer
    from vargp_tpu.utils.profiling import device_trace

    cfg, params, prev, prior, x, y, w, key = g._flagship()
    hp = TrainHyperparams(lr=3e-3, beta=10.0)
    tx = make_optimizer(hp)
    opt_state = tx.init(params)
    run_block = make_device_train_fn(
        cfg, tx, hp.beta, batch_size=x.shape[0], n_epochs=args.block
    )
    chain_mask = jnp.ones((len(prev),), jnp.float32)
    n_train = jnp.asarray(50000.0)

    # compile + warmup
    params, opt_state, loss_val, _ = run_block(
        params, opt_state, prev, prior, chain_mask, n_train, x, y, w, key
    )
    print("warmup loss:", float(loss_val))

    n_dispatch = max(1, args.steps // args.block)
    with device_trace() as tr:
        for i in range(n_dispatch):
            k = jax.random.fold_in(key, i)
            params, opt_state, loss_val, _ = run_block(
                params, opt_state, prev, prior, chain_mask, n_train, x, y, w, k
            )
        float(loss_val)
    events = tr["events"]
    n_steps = n_dispatch * args.block
    total = sum(events.values())
    print(f"\ntotal device time: {total / n_steps:.3f} ms/step over {n_steps} steps")
    print(f"{'ms/step':>9}  {'%':>5}  op")
    for name, ms in sorted(events.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{ms / n_steps:9.4f}  {100 * ms / total:5.1f}  {name[:110]}")


if __name__ == "__main__":
    main()
