"""Device-time profiling helpers.

The reference has no tracing/profiling story (SURVEY.md §5 — tqdm only).
On TPU — especially tunneled/remote chips where ``block_until_ready`` can
return before device completion — wall clocks are unreliable; the XLA
profiler's trace is the ground truth.  These helpers wrap
``jax.profiler`` and parse the trace into per-op device times.
"""

import collections
import glob
import gzip
import json
import os
import re
import tempfile
from contextlib import contextmanager

# XLA control-flow region ops whose timeline slice spans their body's ops
_REGION_OP_RE = re.compile(r"^(while|conditional|call)(\.\d+)?$")


@contextmanager
def device_trace(log_dir: str | None = None):
    """Context manager around jax.profiler.start/stop_trace."""
    import jax

    log_dir = log_dir or tempfile.mkdtemp(prefix="vargp_trace_")
    jax.profiler.start_trace(log_dir)
    holder = {"log_dir": log_dir}
    try:
        yield holder
    finally:
        jax.profiler.stop_trace()
        holder["events"] = parse_trace(log_dir)


def parse_trace(log_dir: str) -> dict[str, float]:
    """Total device duration (ms) per op name from the latest trace file.

    Only the device process's "XLA Ops" thread is counted: the raw trace
    also carries host-side python/runtime events and the nested
    Steps / XLA Modules rows that span the same wall time — summing every
    "X" event over-counts by >10x (this bug skewed round-1 kernel
    microbenchmarks; see ROADMAP item 2).

    Control-flow REGION ops (`while.N` / `conditional.N` / `call.N`) are
    excluded: within the XLA Ops row their slice SPANS the loop body's
    per-op slices (a (K)-batch `lax.scan` emits one `while` event
    containing every body op event), so summing both counts the entire
    body twice.  This inflated the round-2..4 eval-pass device numbers
    ~2x (the train-step traces were unaffected — their scan bodies are
    single-step blocks whose while parent carried no double-counted
    children of consequence; wall-clock cross-checks matched).
    """
    files = sorted(
        glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"), recursive=True)
    )
    if not files:
        return {}
    with gzip.open(files[-1]) as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    device_pids = set()
    op_tids = {}  # pid -> tid of its "XLA Ops" row
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name" and "/device:" in e["args"].get(
                "name", ""
            ):
                device_pids.add(e["pid"])
            elif e.get("name") == "thread_name" and e["args"].get("name") == "XLA Ops":
                op_tids[e["pid"]] = e["tid"]
    durations = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            pid = e.get("pid")
            if pid not in device_pids or e.get("tid") != op_tids.get(pid):
                continue
            name = e.get("name", "?")
            if name.startswith("$") or _REGION_OP_RE.match(name):
                continue
            durations[name] += e["dur"]
    return {k: v / 1000.0 for k, v in durations.items()}


def profile_fn(fn, *args, iters: int = 10, top: int = 15) -> dict[str, float]:
    """Run ``fn(*args)`` ``iters`` times under the profiler and return the
    top per-op device times in ms (divided by iters).  ``fn`` should be
    jitted; the first (compile) call happens outside the trace."""
    import jax

    out = fn(*args)
    jax.tree_util.tree_map(
        lambda t: t.block_until_ready() if hasattr(t, "block_until_ready") else t,
        out,
    )
    with device_trace() as tr:
        for _ in range(iters):
            out = fn(*args)
        jax.tree_util.tree_map(
            lambda t: t.block_until_ready() if hasattr(t, "block_until_ready") else t,
            out,
        )
    events = tr["events"]
    ranked = sorted(events.items(), key=lambda kv: -kv[1])[:top]
    return {k: v / iters for k, v in ranked}
