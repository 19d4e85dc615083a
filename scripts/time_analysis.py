"""Wall-clock attribution of the chain-reload T x T analysis: where do
analyze_sdigits' 1145 s / analyze_smnist's 2562 s actually go — compile,
per-batch dispatch, data, or device compute?  Separates trace / compile /
per-cell execute with AOT stages on the Split-Digits analysis shapes."""

import sys, os, time; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from dataclasses import replace
from vargp_tpu import data
from vargp_tpu.models import vargp as V
from vargp_tpu.train.metrics import compute_acc_ent
from vargp_tpu.experiments.analysis import load_task_chain

log_dir = sys.argv[1] if len(sys.argv) > 1 else "results/sdigits_r4"
n_tasks, M, in_size = 5, 20, 64

t0 = time.perf_counter()
cfg = V.VARGPConfig(M=M, out_size=10, in_size=in_size)
key = jax.random.key(0)
z = jnp.zeros((cfg.out_size, cfg.M, cfg.in_size))
example, _ = V.init_params(key, z, cfg)
chain = load_task_chain(log_dir, n_tasks, example)
test_full = data.load_digits_dataset(train=False, seed=0)
test_sets = [data.filter_by_class(test_full, [2*t, 2*t+1]) for t in range(n_tasks)]
print(f"load: {time.perf_counter()-t0:.1f}s; split sizes {[len(s) for s in test_sets]}", flush=True)

cfg_eval = replace(cfg, n_f=50, n_var_samples=20)

def _predict(params, prev, mask, x, k):
    return V.predict(params, prev, x, k, cfg_eval, chain_mask=mask)

# AOT: separate trace, compile, execute
prev, mask = V.pad_chain(tuple(V.freeze_task(p) for p in chain[:1]), cfg, t_max=n_tasks)
xb = jnp.zeros((512, in_size))
t0 = time.perf_counter()
lowered = jax.jit(_predict).lower(chain[1], prev, mask, xb, key)
print(f"trace+lower: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
compiled = lowered.compile()
print(f"compile: {time.perf_counter()-t0:.1f}s", flush=True)
try:
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    print("flops:", ca.get("flops"), "bytes:", ca.get("bytes accessed"), flush=True)
except Exception as e:
    print("cost_analysis failed:", e, flush=True)

# now the jitted per-cell loop as analysis runs it
pj = jax.jit(_predict)
T = n_tasks
for t in range(T):
    tr = time.perf_counter()
    prev, mask = V.pad_chain(tuple(V.freeze_task(p) for p in chain[:t]), cfg, t_max=T)
    print(f"row {t}: pad_chain {time.perf_counter()-tr:.2f}s", flush=True)
    for s, test_set in enumerate(test_sets):
        key, k = jax.random.split(key)
        tc = time.perf_counter()
        a, e = compute_acc_ent(
            test_set,
            lambda x: pj(chain[t], prev, mask, jnp.asarray(x), k),
            batch_size=512,
        )
        print(f"  cell ({t},{s}): {time.perf_counter()-tc:.2f}s acc={a:.4f}", flush=True)
