"""A/B the fused cross-Gram Pallas kernel (native (H, O, M, B) layout)
against the XLA einsum formulation on real TPU hardware.

The kernel only changes the FORWARD (the custom VJP is shared einsum
math), so both forward-only (the eval/analysis path, where the relayout
transpose was 123 MB/batch at notebook MC budgets) and forward+VJP (the
train step) are timed.

Usage: python scripts/bench_crossgram.py
Prints per-shape wall times (50-call blocks).
"""

import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time

import jax
import jax.numpy as jnp

SHAPES = [
    # (H, O, S, B, D): flagship train / analysis eval / M=1024 / S=1000
    (3, 10, 300, 512, 784),
    (20, 10, 300, 512, 784),
    (3, 10, 1024, 512, 784),
    (3, 10, 1000, 512, 784),
]
N = 50


def run(variant: str):
    from vargp_tpu.ops.pallas.rbf_gram import _cross_gram_4d, _cross_gram_impl
    from vargp_tpu.ops import dispatch

    prec = jax.lax.Precision.HIGH
    out = {}
    for H, O, S, B, D in SHAPES:
        z = jax.random.normal(jax.random.PRNGKey(0), (O, S, D), jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(1), (B, D), jnp.float32)
        invs2 = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (H, D))) + 0.3
        g2 = jnp.ones((H,), jnp.float32)

        if variant == "pallas":
            # take z through the traced argument (NOT a closure) so the
            # kernel's pad/layout prep cannot constant-fold at compile
            # time — the XLA arm pays that cost from its traced operand
            base = lambda z_: _cross_gram_4d(z_, x, invs2, g2, precision=prec)
        else:
            # force the einsum branch regardless of backend
            def base(z_):
                xs = x[None] * invs2[:, None, :]
                cross = jnp.einsum("oid,hbd->hoib", z_, xs, precision=prec)
                zz = jnp.einsum("oid,hd->hoi", z_ * z_, invs2, precision=prec)
                xx = jnp.einsum("bd,hd->hb", x * x, invs2, precision=prec)
                d2 = jnp.maximum(
                    zz[..., None] + xx[:, None, None, :] - 2.0 * cross, 0.0
                )
                return g2[:, None, None, None] * jnp.exp(-0.5 * d2)

        # consume through the PRODUCTION consumer (W = L_inv @ Kzx, a
        # bf16x3 matmul over the row axis) so any relayout cost between
        # the Gram and the whitening is charged to the variant that pays it
        Li = jax.random.normal(jax.random.PRNGKey(3), (H, O, S, S), jnp.float32)
        from vargp_tpu.gpmath.linalg import mm_h

        fwd = jax.jit(lambda z_: jnp.sum(jnp.square(mm_h(Li, base(z_)))))
        for name, fn in (("fwd", fwd),):
            r = fn(z)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            for _ in range(N):
                r = fn(z)
            jax.block_until_ready(r)
            ms = (time.perf_counter() - t0) / N * 1e3
            out[(H, O, S, B, D, name)] = ms
            print(f"{variant:6s} ({H},{O},{S},{B},{D}) {name:4s} {ms:8.3f} ms", flush=True)
    return out


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    a = run("xla")
    b = run("pallas")
    for k in a:
        print(f"{k}: xla {a[k]:.3f} ms vs pallas {b[k]:.3f} ms  ({a[k]/b[k]:.2f}x)")
