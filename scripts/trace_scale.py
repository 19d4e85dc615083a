"""Per-op device-time trace of the SCALE-regime steps (M=1024 single task /
sum(M)=1000 padded chain) — the flagship variant is scripts/trace_step.py.

Usage: python scripts/trace_scale.py [m1024|s1000]

Keep the traced block short: at M=1024 a 3-step trace survives where a
20-step one crashes the tunneled profiler (ROADMAP round-2 note).
"""

import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import glob, gzip, json, collections, tempfile
import jax, jax.numpy as jnp
import __graft_entry__ as g
from vargp_tpu.train.loop import TrainHyperparams, make_device_train_fn, make_optimizer

mode = sys.argv[1] if len(sys.argv) > 1 else "m1024"
n_tasks, M = (1, 1024) if mode == "m1024" else (10, 100)
N_TRACED = 3

cfg, params, prev, prior, x, y, w, key = g._flagship(n_tasks=n_tasks, M=M)
hp = TrainHyperparams(lr=3e-3, beta=10.0)
tx = make_optimizer(hp)
opt_state = tx.init(params)
run_block = make_device_train_fn(cfg, tx, hp.beta, batch_size=x.shape[0], n_epochs=1)
chain_mask = jnp.ones((len(prev),), jnp.float32)
n_train = jnp.asarray(50000.0)
# NB: run_block donates params/opt_state — thread the returned ones
params, opt_state, loss_val, _ = run_block(
    params, opt_state, prev, prior, chain_mask, n_train, x, y, w, key)
print("warm ok, loss", float(loss_val), flush=True)

log_dir = tempfile.mkdtemp(prefix=f"trace_{mode}_")
jax.profiler.start_trace(log_dir)
for i in range(N_TRACED):
    k = jax.random.fold_in(key, i)
    params, opt_state, loss_val, _ = run_block(
        params, opt_state, prev, prior, chain_mask, n_train, x, y, w, k)
float(loss_val)
jax.profiler.stop_trace()

files = sorted(glob.glob(log_dir + "/**/*.trace.json.gz", recursive=True))
with gzip.open(files[-1]) as f:
    tr = json.load(f)
pnames, tnames = {}, {}
for e in tr["traceEvents"]:
    if e.get("ph") == "M":
        if e.get("name") == "process_name": pnames[e["pid"]] = e["args"].get("name","")
        if e.get("name") == "thread_name": tnames[(e["pid"], e["tid"])] = e["args"].get("name","")
dev = [p for p,n in pnames.items() if "/device:" in n][0]
opstid = [t for (p,t),n in tnames.items() if p==dev and n=="XLA Ops"][0]
cat = collections.Counter()
for e in tr["traceEvents"]:
    if e.get("ph")=="X" and "dur" in e and e["pid"]==dev and e["tid"]==opstid:
        cat[e.get("args",{}).get("tf_op","") or e["name"]] += e["dur"]
total = sum(cat.values())
print(f"[{mode}] device-busy {total/N_TRACED/1000:.3f} ms/step")
for k,v in cat.most_common(25):
    print(f"{v/N_TRACED/1000:8.4f} ms {100*v/total:5.1f}%  {k[:115]}")
