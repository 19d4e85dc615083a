"""Floor table: static FLOP/byte audit of the production train block.

Uses vargp_tpu.utils.flops (shared with bench.py) to walk the closed
jaxpr of the exact program the drivers dispatch and print per-regime
speed-of-light floors:
  HIGHEST (f32 via 6-pass bf16) ~ 33 TFLOP/s on v5e
  HIGH (bf16x3)                 ~ 65 TFLOP/s
  HBM                           ~ 820 GB/s

Usage: python scripts/flops_audit.py [flagship|m1024|s1000]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

import __graft_entry__ as g
from vargp_tpu.train.loop import TrainHyperparams, make_device_train_fn, make_optimizer
from vargp_tpu.utils import flops as F


def main(mode="m1024"):
    n_tasks, M = {"flagship": (5, 60), "m1024": (1, 1024), "s1000": (10, 100)}[mode]
    cfg, params, prev, prior, x, y, w, key = g._flagship(n_tasks=n_tasks, M=M)
    hp = TrainHyperparams(lr=3e-3, beta=10.0)
    tx = make_optimizer(hp)
    opt_state = tx.init(params)
    run_block = make_device_train_fn(
        cfg, tx, hp.beta, batch_size=x.shape[0], n_epochs=1
    )
    chain_mask = jnp.ones((len(prev),), jnp.float32)
    n_train = jnp.asarray(50000.0)
    summary, dots, moves = F.audit(
        lambda *a: run_block(*a),
        params, opt_state, prev, prior, chain_mask, n_train, x, y, w, key,
    )

    print(f"== {mode}: top dot_generals (per dispatched block) ==")
    for ((ls, rs), p), fl in sorted(dots.items(), key=lambda kv: -kv[1])[:18]:
        print(f"  {fl/1e9:9.2f} GFLOP  {p:8s} {ls} x {rs}")
    print(
        f"\ntotals: HIGHEST {summary['gflop_highest']:.1f} GFLOP, "
        f"HIGH {summary['gflop_high']:.1f}, "
        f"DEFAULT {summary['gflop_default']:.1f}; "
        f"movement {summary['movement_mb']:.1f} MB"
    )
    print("movement by op:", {k: f"{v/1e6:.0f}MB" for k, v in moves.most_common(8)})
    print(
        f"speed-of-light (matmul+movement only): {summary['sol_ms']:.2f} ms per block"
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "m1024")
