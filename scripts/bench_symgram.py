"""A/B the triangle-skip symmetric-Gram kernel against the whole-block one
on real TPU hardware, at flagship and scale shapes.

The tri kernel (VARGP_TPU_SYMGRAM=tri) computes only the lower 128-row
panels and mirrors the finished tiles in VMEM — ~42% fewer MXU FLOPs for
extra VPU transposes; profitability is shape-dependent, so measure before
flipping the default.

Usage: python scripts/bench_symgram.py
Prints per-shape wall times (50-call blocks, donated buffers) for both
variants, forward and forward+VJP.
"""

import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time

import jax
import jax.numpy as jnp

SHAPES = [
    # (H, O, M, D)  flagship task-4 / M=100 chain / M=1024 scale
    (3, 10, 300, 784),
    (3, 10, 1000, 784),
    (3, 10, 1024, 784),
    (3, 10, 128, 784),
]
N = 50


def run(variant: str):
    if variant == "tri":
        os.environ["VARGP_TPU_SYMGRAM"] = "tri"
    else:
        os.environ.pop("VARGP_TPU_SYMGRAM", None)
    from vargp_tpu.ops.pallas import rbf_gram as RG

    out = {}
    for H, O, M, D in SHAPES:
        k = jax.random.PRNGKey(0)
        z = jax.random.normal(k, (O, M, D), jnp.float32)
        invs = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (H, D))) + 0.3
        g2 = jnp.ones((H,), jnp.float32)

        fwd = jax.jit(lambda z_: jnp.sum(RG.sym_gram_pallas(z_, invs, g2)))
        vjp = jax.jit(jax.grad(lambda z_: jnp.sum(RG.sym_gram_pallas(z_, invs, g2))))

        for name, fn in (("fwd", fwd), ("fwd+bwd", vjp)):
            r = fn(z)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            for _ in range(N):
                r = fn(z)
            jax.block_until_ready(r)
            ms = (time.perf_counter() - t0) / N * 1e3
            out[(H, O, M, D, name)] = ms
            print(f"{variant:5s} ({H},{O},{M},{D}) {name:7s} {ms:8.3f} ms", flush=True)
    return out


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices()[0])
    whole = run("whole")
    tri = run("tri")
    print("\nspeedup (whole/tri):")
    for key in whole:
        print(f"  {key}: {whole[key] / tri[key]:.2f}x")
