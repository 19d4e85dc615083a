"""Static FLOP/byte audit of the jitted EVAL pass (chain-reload analysis
protocol budgets: n_f=50, n_var_samples=20) — companion to
scripts/flops_audit.py, which audits the train block.

The TxT accuracy-matrix analysis (mnist.ipynb cell 12 protocol,
experiments/analysis.py) dispatches this eval program T*(T+1)/2 times per
experiment, so structural waste here multiplies across the deliverable
runs.  Usage: python scripts/flops_audit_eval.py [flagship|m1024]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

import __graft_entry__ as g
from vargp_tpu.train.loop import TrainHyperparams, make_device_eval_fn
from vargp_tpu.utils import flops as F


def main(mode="flagship"):
    n_tasks, M = {"flagship": (5, 60), "m1024": (1, 1024)}[mode]
    cfg, params, prev, prior, x, y, w, key = g._flagship(n_tasks=n_tasks, M=M)
    hp = TrainHyperparams(lr=3e-3, beta=10.0, eval_n_f=50, eval_n_var_samples=20)
    eval_acc = make_device_eval_fn(cfg, hp)
    K = 4  # eval batches per dispatch (analysis runs ~4-20)
    xs = jnp.broadcast_to(x, (K,) + x.shape)
    ys = jnp.broadcast_to(y, (K,) + y.shape)
    ws = jnp.broadcast_to(w, (K,) + w.shape)
    cm = jnp.ones((len(prev),), jnp.float32)
    summary, dots, moves = F.audit(
        lambda *a: eval_acc(*a), params, prev, cm, xs, ys, ws, key
    )
    print(f"== eval {mode} (K={K} batches/dispatch): top dot_generals ==")
    for ((ls, rs), p), fl in sorted(dots.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {fl/1e9:9.2f} GFLOP  {p:8s} {ls} x {rs}")
    print(
        f"\ntotals: HIGHEST {summary['gflop_highest']:.1f} GFLOP, "
        f"HIGH+DEFAULT {summary['gflop_high'] + summary['gflop_default']:.1f}; "
        f"movement {summary['movement_mb']:.1f} MB"
    )
    print("movement by op:", {k: f"{v/1e6:.0f}MB" for k, v in moves.most_common(8)})
    print(
        f"speed-of-light (matmul+movement only): {summary['sol_ms']:.2f} ms per dispatch"
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "flagship")
