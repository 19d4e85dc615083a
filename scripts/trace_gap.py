"""Diagnose the S=1000 wall-vs-device gap: trace a multi-step block and
report every device-side thread's busy time, the module-level span, and
the idle time between ops inside the span.

The 2026-08-18 session measured 46.7 ms/step wall (50-step blocks) vs
28.6 ms/step device-busy (1-step dispatches) for the sum(M)=1000 padded
chain — this script localizes the missing ~18 ms/step.

Usage: python scripts/trace_gap.py [s1000|m1024] [steps_per_block]
"""

import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import glob, gzip, json, collections, tempfile, time
import jax, jax.numpy as jnp
import __graft_entry__ as g
from vargp_tpu.train.loop import TrainHyperparams, make_device_train_fn, make_optimizer

mode = sys.argv[1] if len(sys.argv) > 1 else "s1000"
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
n_tasks, M = (1, 1024) if mode == "m1024" else (10, 100)

cfg, params, prev, prior, x, y, w, key = g._flagship(n_tasks=n_tasks, M=M)
hp = TrainHyperparams(lr=3e-3, beta=10.0)
tx = make_optimizer(hp)
opt_state = tx.init(params)
run_block = make_device_train_fn(cfg, tx, hp.beta, batch_size=x.shape[0], n_epochs=STEPS)
chain_mask = jnp.ones((len(prev),), jnp.float32)
n_train = jnp.asarray(50000.0)
params, opt_state, loss_val, _ = run_block(
    params, opt_state, prev, prior, chain_mask, n_train, x, y, w, key)
print("warm ok, loss", float(loss_val), flush=True)

N_DISPATCH = 2
t0 = time.time()
log_dir = tempfile.mkdtemp(prefix=f"gap_{mode}_")
jax.profiler.start_trace(log_dir)
for i in range(N_DISPATCH):
    k = jax.random.fold_in(key, i)
    params, opt_state, loss_val, _ = run_block(
        params, opt_state, prev, prior, chain_mask, n_train, x, y, w, k)
float(loss_val)
jax.profiler.stop_trace()
wall = (time.time() - t0) * 1000 / (N_DISPATCH * STEPS)
print(f"[{mode}] wall {wall:.2f} ms/step ({N_DISPATCH} dispatches x {STEPS} steps)")

files = sorted(glob.glob(log_dir + "/**/*.trace.json.gz", recursive=True))
with gzip.open(files[-1]) as f:
    tr = json.load(f)
pnames, tnames = {}, {}
for e in tr["traceEvents"]:
    if e.get("ph") == "M":
        if e.get("name") == "process_name": pnames[e["pid"]] = e["args"].get("name", "")
        if e.get("name") == "thread_name": tnames[(e["pid"], e["tid"])] = e["args"].get("name", "")
devs = [p for p, n in pnames.items() if "/device:" in n]
print("device pids:", {p: pnames[p] for p in devs})

nsteps = N_DISPATCH * STEPS
for dev in devs:
    per_thread = collections.Counter()
    spans = collections.defaultdict(list)
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and "dur" in e and e["pid"] == dev:
            tn = tnames.get((dev, e["tid"]), str(e["tid"]))
            per_thread[tn] += e["dur"]
            spans[tn].append((e["ts"], e["dur"], e["name"]))
    for tn, tot in per_thread.most_common():
        print(f"  thread {tn!r}: busy {tot/1000/nsteps:.3f} ms/step "
              f"({len(spans[tn])} events)")
    # module-level spans: per-dispatch device occupancy
    for tn in spans:
        if "Module" in tn or "module" in tn:
            for ts, dur, name in sorted(spans[tn])[:6]:
                print(f"    module {name[:60]}: {dur/1000:.2f} ms")
    # idle inside the XLA Ops row across the whole traced window
    ops = sorted(spans.get("XLA Ops", []))
    if ops:
        t_first = ops[0][0]
        t_last = max(ts + d for ts, d, _ in ops)
        busy = sum(d for _, d, _ in ops)
        print(f"  XLA Ops window {(t_last-t_first)/1000/nsteps:.3f} ms/step, "
              f"busy {busy/1000/nsteps:.3f}, "
              f"idle {((t_last-t_first)-busy)/1000/nsteps:.3f} ms/step")
        # biggest idle gaps between consecutive ops
        gaps = []
        prev_end = ops[0][0]
        for ts, d, name in ops:
            if ts > prev_end:
                gaps.append((ts - prev_end, prev_end - t_first, name))
            prev_end = max(prev_end, ts + d)
        gaps.sort(reverse=True)
        print("  top idle gaps (before op):")
        for gp, off, name in gaps[:12]:
            print(f"    {gp/1000:8.3f} ms at +{off/1000:9.2f} ms before {name[:80]}")
