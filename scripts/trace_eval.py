"""Per-op device-time trace of the default (shared-theta) eval pass at
notebook MC budgets — what actually dominates the ~100 ms 20-batch pass
(the fused cross-Gram kernel removed the relayout yet the end-to-end
number did not move, so the audit's attribution needs a device trace)."""

import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import glob, gzip, json, collections, tempfile
import jax, jax.numpy as jnp
import __graft_entry__ as g
from vargp_tpu.train.loop import TrainHyperparams, make_device_eval_fn

N_ITERS = 10
cfg, params, prev, prior, x, y, w, key = g._flagship()
chain_mask = jnp.ones((len(prev),), jnp.float32)
K = 20
xs = jnp.broadcast_to(x[None], (K, *x.shape))
ys = jnp.broadcast_to(y[None], (K, *y.shape))
ws = jnp.broadcast_to(w[None], (K, *w.shape))
hp = TrainHyperparams(eval_n_f=50, eval_n_var_samples=20)
eval_fn = make_device_eval_fn(cfg, hp)
out = eval_fn(params, prev, chain_mask, xs, ys, ws, key)
jax.block_until_ready(out)

log_dir = tempfile.mkdtemp(prefix="trace_eval_")
jax.profiler.start_trace(log_dir)
for i in range(N_ITERS):
    k = jax.random.fold_in(key, i)
    out = eval_fn(params, prev, chain_mask, xs, ys, ws, k)
jax.block_until_ready(out)
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
import re
# exclude control-flow region parents: the `while` op's slice SPANS its
# body ops' slices (verified: 940 child events totaling 47.88 ms inside
# while.6's 47.98 ms span), so summing both double-counts the scan body
region = re.compile(r"^(while|conditional|call)(\.\d+)?$")
cat = collections.Counter()
for e in tr["traceEvents"]:
    if e.get("ph")=="X" and "dur" in e and e["pid"]==dev and e["tid"]==opstid:
        if region.match(e["name"]):
            continue
        cat[e.get("args",{}).get("tf_op","") or e["name"]] += e["dur"]
total = sum(cat.values())
print(f"total {total/N_ITERS/1000:.3f} ms/pass ({K} batches)")
for k,v in cat.most_common(25):
    print(f"{v/N_ITERS/1000:8.4f} ms {100*v/total:5.1f}%  {k[:115]}")
