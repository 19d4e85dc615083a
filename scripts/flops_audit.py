"""Static FLOP/byte audit of a jitted step from its jaxpr.

Walks the closed jaxpr of the production train block (including scan
bodies, multiplying by trip count) and accumulates:
  * dot_general FLOPs grouped by (lhs, rhs shape, precision),
  * bytes moved by pure data-movement ops (pad/concatenate/transpose/
    convert/broadcast_in_dim with materialization).

This is hardware-independent, so it runs on CPU while the TPU tunnel is
down and yields a speed-of-light estimate for the TPU step:
  HIGHEST (f32 via 6-pass bf16) ~ 33 TFLOP/s on v5e
  HIGH (bf16x3)                 ~ 65 TFLOP/s
  HBM                           ~ 820 GB/s

Usage: python scripts/flops_audit.py [flagship|m1024|s1000]
"""

import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import collections
import math

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

import __graft_entry__ as g
from vargp_tpu.train.loop import TrainHyperparams, make_device_train_fn, make_optimizer

HIGHEST_TFLOPS = 33e12
HIGH_TFLOPS = 65e12
HBM = 820e9

MOVE_OPS = {"pad", "concatenate", "transpose", "convert_element_type",
            "gather", "scatter", "scatter-add", "dynamic_slice",
            "dynamic_update_slice", "rev", "reshape", "copy"}


def _dot_flops(eqn):
    dn = eqn.params["dimension_numbers"]
    (lc, rc), (lb, rb) = dn
    lhs, rhs = (v.aval for v in eqn.invars[:2])
    batch = math.prod(lhs.shape[d] for d in lb)
    k = math.prod(lhs.shape[d] for d in lc)
    m = math.prod(
        s for d, s in enumerate(lhs.shape) if d not in set(lc) | set(lb)
    )
    n = math.prod(
        s for d, s in enumerate(rhs.shape) if d not in set(rc) | set(rb)
    )
    return 2 * batch * m * n * k, (tuple(lhs.shape), tuple(rhs.shape))


def _bytes(aval):
    return math.prod(aval.shape) * aval.dtype.itemsize


def walk(jaxpr, mult, dots, moves):
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            fl, shapes = _dot_flops(eqn)
            prec = eqn.params.get("precision")
            p = prec[0].name if prec else "DEFAULT"
            dots[(shapes, p)] += fl * mult
        elif name in MOVE_OPS:
            moves[name] += sum(_bytes(v.aval) for v in eqn.outvars) * mult
        for sub in eqn.params.values():
            inner = getattr(sub, "jaxpr", None)
            if inner is not None:
                m2 = mult
                if name == "scan":
                    m2 = mult * eqn.params.get("length", 1)
                walk(inner, m2, dots, moves)
            elif isinstance(sub, (list, tuple)):
                for s in sub:
                    inner = getattr(s, "jaxpr", None)
                    if inner is not None:
                        walk(inner, mult, dots, moves)


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
    closed = jax.make_jaxpr(
        lambda *a: run_block(*a)
    )(params, opt_state, prev, prior, chain_mask, n_train, x, y, w, key)

    dots = collections.Counter()
    moves = collections.Counter()
    walk(closed.jaxpr, 1.0, dots, moves)
    # the train block runs n_steps internally (scan over batches) — the
    # scan multiplier above already accounts for it; report per-program.
    tot = {"HIGHEST": 0.0, "HIGH": 0.0, "DEFAULT": 0.0}
    print(f"== {mode}: top dot_generals (per dispatched block) ==")
    for ((ls, rs), p), fl in sorted(dots.items(), key=lambda kv: -kv[1])[:18]:
        tot[p] = tot.get(p, 0.0) + fl
        print(f"  {fl/1e9:9.2f} GFLOP  {p:8s} {ls} x {rs}")
    for ((ls, rs), p), fl in sorted(dots.items(), key=lambda kv: -kv[1])[18:]:
        tot[p] = tot.get(p, 0.0) + fl
    gH, gh = tot.get("HIGHEST", 0.0), tot.get("HIGH", 0.0)
    gd = tot.get("DEFAULT", 0.0)
    mv = sum(moves.values())
    print(f"\ntotals: HIGHEST {gH/1e9:.1f} GFLOP, HIGH {gh/1e9:.1f}, "
          f"DEFAULT {gd/1e9:.1f}; movement {mv/1e6:.1f} MB")
    print("movement by op:", {k: f"{v/1e6:.0f}MB" for k, v in moves.most_common(8)})
    sol = gH / HIGHEST_TFLOPS + (gh + gd) / HIGH_TFLOPS + mv / HBM
    print(f"speed-of-light (matmul+movement only): {sol*1e3:.2f} ms per block")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "m1024")
