"""Micro-benchmark the factorization path at benchmark shapes.

Times (device-trace based, not wall clock) for the (30, 300, 300) batched
SPD factorization that dominates the flagship step's latency budget:

  - XLA batched Cholesky alone
  - chol + Newton-Schulz tri_inv (the production chol_and_inv forward)
  - full value+grad through chol_and_inv (exercises the custom matmul VJP)
  - the Pallas one-matrix-per-program kernel (opt-in comparison)

Usage: python scripts/bench_chol.py [--g 30] [--n 300] [--iters 50]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _timed(label, fn, args, iters):
    import jax

    from vargp_tpu.utils.profiling import device_trace

    out = fn(*args)
    jax.block_until_ready(out)
    with device_trace() as tr:
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
    total = sum(tr["events"].values()) / iters
    print(f"{label:45s} {total:8.4f} ms/call (device)")
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--g", type=int, default=30)
    ap.add_argument("--n", type=int, default=300)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vargp_tpu.gpmath.linalg import tri_inv
    from vargp_tpu.ops.dispatch import chol_and_inv

    key = jax.random.key(0)
    A = jax.random.normal(key, (args.g, args.n, args.n), jnp.float32)
    K = jnp.einsum("gij,gkj->gik", A, A) / args.n + 2.0 * jnp.eye(args.n)

    chol = jax.jit(jnp.linalg.cholesky)
    _timed("XLA batched cholesky", chol, (K,), args.iters)

    ci = jax.jit(lambda K: chol_and_inv(K))
    _timed("chol_and_inv fwd (chol + NS tri_inv)", ci, (K,), args.iters)

    tinv = jax.jit(tri_inv)
    L = chol(K)
    _timed("NS tri_inv alone", tinv, (L,), args.iters)

    def loss(K):
        L, Li = chol_and_inv(K)
        return jnp.sum(L * L) + jnp.sum(Li)

    g = jax.jit(jax.grad(loss))
    _timed("chol_and_inv value+grad", g, (K,), args.iters)

    try:
        from vargp_tpu.ops.pallas.chol import cholesky_pallas

        cp = jax.jit(cholesky_pallas)
        _timed("Pallas cholesky (one-matrix/program)", cp, (K,), args.iters)
    except Exception as e:  # noqa: BLE001
        print("pallas chol unavailable:", e)


if __name__ == "__main__":
    main()
