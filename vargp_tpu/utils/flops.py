"""Static FLOP/byte audit of a jitted block from its jaxpr.

Walks a closed jaxpr (descending into scan/cond bodies, multiplying by
trip count) and accumulates dot_general FLOPs grouped by shape+precision
and bytes materialized by pure data-movement ops.  Hardware-independent:
tracing needs no device, so this runs anywhere and yields a
speed-of-light (SoL) estimate for the TPU step from published v5e
numbers.  Consumed by scripts/flops_audit*.py (floor tables) and
bench.py (achieved-TFLOP/s reporting — the second metric BASELINE.json
names).

Reference counterpart: none (the torch reference reports no FLOP
accounting); SoL methodology follows the scaling-book roofline recipe.
"""

from __future__ import annotations

import collections
import math

# v5e single-chip peaks. HIGHEST f32 matmuls lower to 6-pass bf16 on the
# MXU (~33 TFLOP/s effective); HIGH (bf16x3) ~65; pure bf16 ~197.
HIGHEST_TFLOPS = 33e12
HIGH_TFLOPS = 65e12
BF16_TFLOPS = 197e12
HBM_BYTES_PER_S = 820e9

MOVE_OPS = {
    "pad", "concatenate", "transpose", "convert_element_type",
    "gather", "scatter", "scatter-add", "dynamic_slice",
    "dynamic_update_slice", "rev", "reshape", "copy",
}


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


def _aval_bytes(aval):
    return math.prod(aval.shape) * aval.dtype.itemsize


def walk(jaxpr, mult, dots, moves):
    """Accumulate dot FLOPs / movement bytes over ``jaxpr`` recursively."""
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            fl, shapes = _dot_flops(eqn)
            prec = eqn.params.get("precision")
            p = prec[0].name if prec else "DEFAULT"
            dots[(shapes, p)] += fl * mult
        elif name == "pallas_call":
            # custom kernels advertise their work via cost_estimate; count
            # them in their own bucket (every production kernel runs its
            # matmuls bf16x3 or f32-VPU — billed at the HIGH roofline in
            # the SoL sum, the optimistic choice) so TPU-path audits don't
            # silently drop the Pallas ops' FLOPs
            ce = eqn.params.get("cost_estimate")
            if ce is not None and getattr(ce, "flops", 0):
                shapes = tuple(
                    tuple(v.aval.shape) for v in eqn.invars[:2]
                )
                dots[((shapes, ()), "PALLAS")] += ce.flops * mult
            continue
        elif name in MOVE_OPS:
            moves[name] += sum(_aval_bytes(v.aval) for v in eqn.outvars) * mult
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


def audit(fn, *args):
    """Audit ``fn(*args)``: returns (summary dict, dots Counter, moves Counter).

    summary: gflop_highest / gflop_high / gflop_default / movement_mb /
    sol_ms (matmul+movement-only speed-of-light per call).
    """
    import jax

    closed = jax.make_jaxpr(fn)(*args)
    dots: collections.Counter = collections.Counter()
    moves: collections.Counter = collections.Counter()
    walk(closed.jaxpr, 1.0, dots, moves)
    tot = collections.Counter()
    for ((_, _), p), fl in dots.items():
        tot[p] += fl
    g_hst, g_h, g_d = tot["HIGHEST"], tot["HIGH"], tot["DEFAULT"]
    g_pl = tot["PALLAS"]
    mv = sum(moves.values())
    sol = (
        g_hst / HIGHEST_TFLOPS
        + (g_h + g_d + g_pl) / HIGH_TFLOPS
        + mv / HBM_BYTES_PER_S
    )
    summary = dict(
        gflop_highest=g_hst / 1e9,
        gflop_high=g_h / 1e9,
        gflop_default=g_d / 1e9,
        gflop_pallas=g_pl / 1e9,
        movement_mb=mv / 1e6,
        sol_ms=sol * 1e3,
    )
    return summary, dots, moves


def achieved(summary: dict, measured_s: float) -> dict:
    """Achieved TFLOP/s + %-of-SoL for a measured wall time per call."""
    g_pl = summary.get("gflop_pallas", 0.0)
    gf = (
        summary["gflop_highest"]
        + summary["gflop_high"]
        + summary["gflop_default"]
        + g_pl
    )
    # %-peak weights each precision class by its own roofline
    denom_s = (
        summary["gflop_highest"] * 1e9 / HIGHEST_TFLOPS
        + (summary["gflop_high"] + summary["gflop_default"] + g_pl)
        * 1e9
        / HIGH_TFLOPS
    )
    return dict(
        tflops=gf / 1e3 / measured_s,
        pct_matmul_peak=100.0 * denom_s / measured_s,
        pct_sol=100.0 * (summary["sol_ms"] / 1e3) / measured_s,
    )
