"""Large-configuration step benchmarks (wall clock over 50-step device blocks).

Measures the 10-task padded-chain step (sum M = 1000) and the M=1024
single-task step on the real chip.  NOTE: make_device_train_fn donates
params/opt_state — always thread the RETURNED arrays back in; re-passing
the originals surfaces through the axon tunnel as a bare
`INVALID_ARGUMENT: TPU backend error` (not jax's usual deleted-array
message).  Wall clocks through the tunnel are ~+/-15% at these sizes; use
scripts/trace_step.py for per-op claims where the profiler can cope.
"""

import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time, jax, jax.numpy as jnp
import __graft_entry__ as g
from vargp_tpu.train.loop import TrainHyperparams, make_device_train_fn, make_optimizer

def run(n_tasks, M, label, B=512, steps=50):
    cfg, params, prev, prior, x, y, w, key = g._flagship(n_tasks=n_tasks, M=M, B=B)
    hp = TrainHyperparams(lr=3e-3, beta=10.0)
    tx = make_optimizer(hp)
    opt_state = tx.init(params)
    rb = make_device_train_fn(cfg, tx, hp.beta, batch_size=B, n_epochs=steps)
    cm = jnp.ones((len(prev),), jnp.float32)
    nt = jnp.asarray(50000.0)
    # NB: rb donates params/opt_state — always thread the returned ones
    params, opt_state, lv, _ = rb(params, opt_state, prev, prior, cm, nt, x, y, w, key)
    print(label, "warm ok, loss", float(lv), flush=True)
    t0 = time.time()
    params, opt_state, lv, _ = rb(params, opt_state, prev, prior, cm, nt, x, y, w, jax.random.fold_in(key, 1))
    float(lv)
    print(label, round((time.time() - t0) * 1000 / steps, 2), "ms/step (wall)", flush=True)

run(10, 100, "S=1000 padded chain:")
run(1, 1024, "M=1024 single task:")
