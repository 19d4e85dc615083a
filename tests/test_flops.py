"""Unit tests for the jaxpr FLOP/byte auditor (vargp_tpu/utils/flops.py).

The auditor is the basis of every speed-of-light floor claim in ROADMAP
and of bench.py's achieved-TFLOP/s field (the second BASELINE.json
metric), so its counting rules are pinned here against hand-computed
programs.  Reference counterpart: none (the torch reference does no FLOP
accounting).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vargp_tpu.utils import flops as F


def test_single_matmul_flops():
    # (8, 16) @ (16, 32): 2*8*16*32 = 8192 FLOPs, DEFAULT precision
    def f(a, b):
        return a @ b

    summary, dots, moves = F.audit(
        f, jnp.zeros((8, 16)), jnp.zeros((16, 32))
    )
    assert summary["gflop_default"] == pytest.approx(8192 / 1e9)
    assert summary["gflop_highest"] == 0.0
    assert summary["gflop_high"] == 0.0


def test_precision_buckets():
    def f(a, b):
        hi = jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST)
        h = jnp.dot(a, b, precision=jax.lax.Precision.HIGH)
        return hi + h

    summary, _, _ = F.audit(f, jnp.zeros((4, 4)), jnp.zeros((4, 4)))
    fl = 2 * 4 * 4 * 4 / 1e9
    assert summary["gflop_highest"] == pytest.approx(fl)
    assert summary["gflop_high"] == pytest.approx(fl)


def test_batched_dot_counts_batch_dims():
    # batched (3, 8, 16) @ (3, 16, 32) via einsum: 3 * 2*8*16*32
    def f(a, b):
        return jnp.einsum("bij,bjk->bik", a, b)

    summary, _, _ = F.audit(
        f, jnp.zeros((3, 8, 16)), jnp.zeros((3, 16, 32))
    )
    assert summary["gflop_default"] == pytest.approx(3 * 8192 / 1e9)


def test_scan_multiplies_by_trip_count():
    def f(a):
        def body(c, _):
            return c @ a, None

        out, _ = jax.lax.scan(body, a, None, length=5)
        return out

    summary, _, _ = F.audit(f, jnp.zeros((8, 8)))
    assert summary["gflop_default"] == pytest.approx(5 * 2 * 8**3 / 1e9)


def test_movement_bytes_counted():
    def f(a):
        return jnp.pad(a, ((0, 8), (0, 0))).T.reshape(-1)

    summary, _, moves = F.audit(f, jnp.zeros((8, 16), jnp.float32))
    # pad -> (16,16) f32 = 1024 B; transpose + reshape outputs likewise
    assert moves["pad"] == 16 * 16 * 4
    assert summary["movement_mb"] > 0


def test_achieved_consistency():
    # one precision class: pct_matmul_peak must equal the time ratio
    summary = dict(
        gflop_highest=33.0, gflop_high=0.0, gflop_default=0.0,
        movement_mb=0.0, sol_ms=1.0,
    )
    ach = F.achieved(summary, measured_s=2e-3)  # 2 ms for 1 ms of SoL work
    assert ach["pct_sol"] == pytest.approx(50.0)
    # 33 GFLOP at the 33 TFLOP/s HIGHEST roofline = 1 ms ideal -> 50% peak
    assert ach["pct_matmul_peak"] == pytest.approx(50.0)
    assert ach["tflops"] == pytest.approx(33.0 / 2e-3 / 1e3)


def test_audit_runs_on_production_train_block():
    """The auditor must descend the real train block's jaxpr (scan over
    steps, cond branches, custom-vjp calls) without error and find the
    Gram/solve matmuls."""
    import __graft_entry__ as g
    from vargp_tpu.train.loop import (
        TrainHyperparams,
        make_device_train_fn,
        make_optimizer,
    )

    cfg, params, prev, prior, x, y, w, key = g._flagship(n_tasks=2, M=8)
    hp = TrainHyperparams(lr=3e-3, beta=10.0)
    tx = make_optimizer(hp)
    opt_state = tx.init(params)
    run_block = make_device_train_fn(
        cfg, tx, hp.beta, batch_size=x.shape[0], n_epochs=1
    )
    chain_mask = jnp.ones((len(prev),), jnp.float32)
    summary, dots, moves = F.audit(
        lambda *a: run_block(*a),
        params, opt_state, prev, prior, chain_mask,
        jnp.asarray(500.0), x, y, w, key,
    )
    total = (
        summary["gflop_highest"]
        + summary["gflop_high"]
        + summary["gflop_default"]
    )
    assert total > 0 and np.isfinite(total)
    assert summary["sol_ms"] > 0


def test_pallas_cost_estimate_counted():
    """pallas_call FLOPs come from the kernel's advertised cost_estimate
    (own PALLAS bucket, HIGH roofline in the SoL sum); the kernel BODY is
    not walked (that would double-count one tile's dots at the wrong
    multiplicity)."""
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    def f(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=12345, bytes_accessed=0, transcendentals=0
            ),
        )(x)

    summary, dots, _ = F.audit(f, jnp.zeros((8, 128)))
    assert summary["gflop_pallas"] == pytest.approx(12345 / 1e9)
    assert summary["gflop_default"] == 0.0
    assert summary["sol_ms"] == pytest.approx(12345 / F.HIGH_TFLOPS * 1e3)
    ach = F.achieved(summary, 1e-3)
    assert ach["tflops"] == pytest.approx(12345 / 1e9 / 1e-3 / 1e3)
