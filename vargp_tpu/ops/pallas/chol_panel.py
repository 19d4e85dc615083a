"""Pallas TPU kernel: batch-vectorized diagonal-block Cholesky.

The flagship workload factorizes (n_hypers*out_size) SPD matrices of size
sum(M) — e.g. (30, 300, 300) at Split-MNIST task 4.  XLA's TPU Cholesky
lowers this to ~64-wide panels whose diagonal-block factorizations are
latency-bound custom-calls (device trace: 5 sequential custom-calls of
0.14-0.42 ms each = ~1.6 ms of a 6.1 ms train step).  The fix is to keep
the unavoidable sequential dependency (the factorization columns) but
vectorize every step over the BATCH, which XLA's per-matrix custom-call
cannot do.

This kernel factorizes one 128x128 diagonal block for ALL G matrices in a
single Pallas program.  Structure chosen for Mosaic's constraints AND its
compile time / scoped-VMEM stack (fully unrolling 128 rank-1 steps
explodes both):

  - 4 python-unrolled chunks of 32 columns (static lane slices; dynamic
    lane offsets would need 128 alignment);
  - inside a chunk, a rolled ``fori_loop`` of 32 rank-1 steps touching
    only the (G, BS, 32) chunk slab; the traced column index appears
    only in iota masks and masked reduces (Mosaic cannot dynamically
    index lanes);
  - no scatter/dynamic-update: columns accumulate via one-hot adds into
    the chunk factor, which is stored back with a static slice;
  - the rank-32 cross-chunk trailing update is applied as outer products
    in groups of 8, read-modify-writing the trailing columns in place to
    keep the scoped-VMEM stack small.

The surrounding panel algorithm (solve + syrk + inverse assembly, all MXU
matmuls) lives in ``vargp_tpu.gpmath.linalg.chol_and_inv_panel`` — see
dispatch.chol_and_inv.

Replaces torch.cholesky call sites (var_gp/gp_utils.py:10 et al.); the
XLA lax.linalg path remains the correctness reference (tests/test_pallas.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BS = 128  # diagonal block size == MXU tile
CH = 32  # chunk width (unrolled); rank-1 loop rolled within a chunk
GROUP = 8  # outer products per trailing read-modify-write


def _diag_chol_kernel(a_ref, out_ref):
    """Factor the (G, BS, BS) SPD batch in one program, vectorized over G."""
    work = out_ref  # factor in place: out doubles as the working copy
    work[...] = a_ref[...]
    rows_b = jax.lax.broadcasted_iota(jnp.int32, (1, BS), 1)  # (1, BS)
    ch3 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, CH), 2)  # (1, 1, CH)

    for ch in range(BS // CH):  # static unroll: 4 chunks
        c0 = ch * CH
        slab0 = work[:, :, c0 : c0 + CH]  # (G, BS, CH) static lane slice

        def rank1_step(i, carry, c0=c0):
            slab, Lc = carry
            # masked column extraction (i is traced: no dynamic lane index)
            col = jnp.sum(jnp.where(ch3 == i, slab, 0.0), axis=2)  # (G, BS)
            piv = jnp.sum(jnp.where(rows_b == c0 + i, col, 0.0), axis=1)
            l = jnp.where(
                rows_b >= c0 + i,
                col * jax.lax.rsqrt(jnp.maximum(piv, 1e-30))[:, None],
                0.0,
            )  # (G, BS)
            lrow = l[:, c0 : c0 + CH]  # (G, CH) — this chunk's rows of l
            slab = slab - l[:, :, None] * jnp.where(
                ch3 > i, lrow[:, None, :], 0.0
            )
            Lc = Lc + l[:, :, None] * jnp.where(ch3 == i, 1.0, 0.0)
            return slab, Lc

        _, Lc = jax.lax.fori_loop(
            0, CH, rank1_step, (slab0, jnp.zeros_like(slab0))
        )
        work[:, :, c0 : c0 + CH] = Lc

        c1 = c0 + CH
        if c1 < BS:
            # rank-CH trailing update: A[r, c] -= sum_j Lc[r, j] * Lc[c, j]
            # for c >= c1, as outer products in GROUPs of 8 applied in place
            Lcr = Lc[:, c1:, :]  # (G, BS - c1, CH): rows at trailing cols
            for g0 in range(0, CH, GROUP):
                acc = None
                for j in range(g0, g0 + GROUP):
                    lj = Lc[:, :, j]  # (G, BS)
                    ljr = Lcr[:, :, j]  # (G, BS - c1)
                    u = lj[:, :, None] * ljr[:, None, :]  # (G, BS, W)
                    acc = u if acc is None else acc + u
                work[:, :, c1:] = work[:, :, c1:] - acc


def _diag_chol_kernel_unrolled(a_ref, out_ref):
    """Fully static-unrolled variant: no fori_loop, every column index a
    python constant, rank-1 steps touch only the (G, BS, CH) chunk slab.
    ~3x fewer per-step instructions than the rolled kernel (no masked
    column extraction / pivot reduce — static lane indexing instead), at
    the cost of a much larger Mosaic program (compile-time risk)."""
    work = out_ref
    work[...] = a_ref[...]
    rows_b = jax.lax.broadcasted_iota(jnp.int32, (1, BS), 1)  # (1, BS)

    for ch in range(BS // CH):
        c0 = ch * CH
        slab = work[:, :, c0 : c0 + CH]  # (G, BS, CH) value
        cols = []
        for j in range(CH):
            jj = c0 + j
            col = slab[:, :, j]  # (G, BS) static lane index
            G = col.shape[0]
            piv = col[:, jj].reshape(G, 1)  # static
            l = jnp.where(
                rows_b >= jj,
                col * jax.lax.rsqrt(jnp.maximum(piv, 1e-30)),
                0.0,
            )
            cols.append(l)
            if j + 1 < CH:
                # rank-1 update of the remaining chunk columns
                lrow = l[:, c0 + j + 1 : c0 + CH]  # (G, CH-j-1)
                upd = l[:, :, None] * lrow[:, None, :]
                slab = jnp.concatenate(
                    [slab[:, :, : j + 1], slab[:, :, j + 1 :] - upd], axis=-1
                )
        Lc = jnp.stack(cols, axis=-1)  # (G, BS, CH)
        work[:, :, c0 : c0 + CH] = Lc

        c1 = c0 + CH
        if c1 < BS:
            Lcr = Lc[:, c1:, :]
            for g0 in range(0, CH, GROUP):
                acc = None
                for j in range(g0, g0 + GROUP):
                    lj = Lc[:, :, j]
                    ljr = Lcr[:, :, j]
                    u = lj[:, :, None] * ljr[:, None, :]
                    acc = u if acc is None else acc + u
                work[:, :, c1:] = work[:, :, c1:] - acc


@functools.partial(jax.jit, static_argnames=("interpret", "unrolled"))
def diag_chol_pallas(
    K: jax.Array, interpret: bool = False, unrolled: bool = False
) -> jax.Array:
    """Batched lower Cholesky of (..., 128, 128) SPD blocks — one Pallas
    program for the whole batch.  Caller applies jitter."""
    batch = K.shape[:-2]
    assert K.shape[-1] == BS and K.shape[-2] == BS, K.shape
    Kb = K.reshape(-1, BS, BS).astype(jnp.float32)
    G = Kb.shape[0]
    out = pl.pallas_call(
        _diag_chol_kernel_unrolled if unrolled else _diag_chol_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, BS, BS), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=G * BS * BS * BS // 3,
            bytes_accessed=2 * 4 * G * BS * BS,
            transcendentals=G * BS,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(40 * 1024 * 1024) if not interpret else None
        ),
        interpret=interpret,
    )(Kb)
    return out.reshape(*batch, BS, BS).astype(K.dtype)
