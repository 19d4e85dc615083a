"""Per-op device-time trace of the flagship training step (the successor
of profile_step.py using the device-thread-only trace accounting)."""

import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import glob, gzip, json, collections, tempfile
import jax, jax.numpy as jnp
import __graft_entry__ as g
from vargp_tpu.train.loop import TrainHyperparams, make_device_train_fn, make_optimizer

cfg, params, prev, prior, x, y, w, key = g._flagship()
hp = TrainHyperparams(lr=3e-3, beta=10.0)
tx = make_optimizer(hp)
opt_state = tx.init(params)
run_block = make_device_train_fn(cfg, tx, hp.beta, batch_size=x.shape[0], n_epochs=1)
chain_mask = jnp.ones((len(prev),), jnp.float32)
n_train = jnp.asarray(50000.0)
params, opt_state, loss_val, _ = run_block(params, opt_state, prev, prior, chain_mask, n_train, x, y, w, key)
float(loss_val)
log_dir = tempfile.mkdtemp(prefix="trace3_")
jax.profiler.start_trace(log_dir)
for i in range(20):
    k = jax.random.fold_in(key, i)
    params, opt_state, loss_val, _ = run_block(params, opt_state, prev, prior, chain_mask, n_train, x, y, w, k)
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
print(f"total {total/20/1000:.3f} ms/step")
for k,v in cat.most_common(20):
    print(f"{v/20/1000:8.4f} ms {100*v/total:5.1f}%  {k[:115]}")
