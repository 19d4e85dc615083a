"""Fit wall(n_steps_per_block) = a + b*n for the padded-chain step to
separate per-dispatch (host/tunnel) overhead from per-step device time.

2026-08-18: s1000 traces show 28.5 ms/step on-device while 50-step blocks
measure 46.7 ms/step wall — this script localizes the difference.

Usage: python scripts/bench_dispatch.py [s1000|m1024]
"""

import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time
import jax, jax.numpy as jnp
import __graft_entry__ as g
from vargp_tpu.train.loop import TrainHyperparams, make_device_train_fn, make_optimizer

mode = sys.argv[1] if len(sys.argv) > 1 else "s1000"
n_tasks, M = (1, 1024) if mode == "m1024" else (10, 100)

cfg, params0, prev, prior, x, y, w, key = g._flagship(n_tasks=n_tasks, M=M)
hp = TrainHyperparams(lr=3e-3, beta=10.0)
tx = make_optimizer(hp)
chain_mask = jnp.ones((len(prev),), jnp.float32)
n_train = jnp.asarray(50000.0)

for steps in (1, 5, 10, 25, 50):
    rb = make_device_train_fn(cfg, tx, hp.beta, batch_size=x.shape[0],
                              n_epochs=steps)
    # rb donates params/opt_state — give each block size its own copy
    params = jax.tree.map(lambda a: a + 0, params0)
    opt_state = tx.init(params)
    # warm (compile)
    params, opt_state, lv, _ = rb(params, opt_state, prev, prior,
                                  chain_mask, n_train, x, y, w, key)
    float(lv)
    reps = max(1, 100 // steps)
    t0 = time.time()
    for i in range(reps):
        k = jax.random.fold_in(key, i)
        params, opt_state, lv, _ = rb(params, opt_state, prev, prior,
                                      chain_mask, n_train, x, y, w, k)
    float(lv)
    dt = (time.time() - t0) * 1000
    print(f"steps/block={steps:3d}: {dt/reps:9.2f} ms/block  "
          f"{dt/(reps*steps):7.2f} ms/step  ({reps} blocks)", flush=True)
