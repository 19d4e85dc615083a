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

STATUS of the v2 kernels below (_diag_chol_kernel / _unrolled): kept as
negative results — the rolled variant runs ~0.9 ms vs XLA's 0.43 ms per
(30,128,128) (per-iteration masked-reduce overhead, 32-lane slabs), the
unrolled variant is a Mosaic compile bomb.  The PRODUCTION kernel is the
v3 ``diag_chol_pallas_t`` further below (0.048 ms device time on the same
shape — 8.7x faster than XLA), wired in via
``vargp_tpu.gpmath.linalg._diag_chol`` → ``ops.dispatch.chol_and_inv``
(blocked split path: solve + syrk + inverse assembly, all MXU matmuls).

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


# ---------------------------------------------------------------------------
# v3: row-major-lane ("transposed") layout kernel
# ---------------------------------------------------------------------------
#
# Why the v2 kernels above lose to XLA (measured 0.94 vs 0.43 ms per
# (30,128,128)): their working slab is (G, BS, CH=32) — the LANE dimension
# carries only 32 of 128 lanes (75% of the VPU idle on every op), the G
# batch multiplies the sublane-tile count, and each rank-1 step pays
# traced-index masked reduces (column extraction + pivot).
#
# v3 fixes all three:
#   * The factor is built in a (G, col, row) scratch — the last (lane)
#     dimension is the full 128 rows, so every VPU op uses all lanes, and
#     a column of L is a STATIC sublane slice, not a masked reduce.
#     Because K is symmetric, reading A "by columns" in this layout needs
#     no input transpose: A[:, j, :] IS column j.
#   * All 128 rank-1 steps are statically unrolled (panel/sub-chunk/step
#     indices are python ints) — no traced-index masking anywhere.  Unlike
#     the v2 unrolled variant (an 18-min Mosaic compile bomb), the factor
#     accumulates via static scratch writes, not O(n^2) concatenate
#     chains, so program size stays linear in BS.
#   * Cross-panel updates are ONE left-looking MXU matmul per 32-column
#     panel (zero-initialized scratch makes the full-K contraction exact),
#     and cross-sub-chunk updates inside a panel are rank-8 MXU matmuls.
#     Only the (G, 8, 128) sub-chunk slab is touched by rank-1 updates.
#
# A non-positive pivot produces NaN via rsqrt (no clamp) so failures stay
# detectable — see ADVICE r2.

PW = 32  # panel width: cross-panel updates via one MXU matmul per panel
SW = 8  # sub-chunk width: rank-1 updates touch only a (G, SW, BS) slab


def _diag_chol_t_kernel(a_ref, out_ref, lt_ref):
    """Batched 128x128 Cholesky, (G, col, row) factor scratch.

    a_ref: (G, BS, BS) symmetric input.  out_ref: (G, BS, BS) lower L.
    lt_ref: (G, BS, BS) scratch holding L^T rows (lt[g, j, :] = column j
    of L, zero where not yet computed).
    """
    f32 = jnp.float32
    lt_ref[...] = jnp.zeros_like(lt_ref)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, BS), 1)  # row index

    for p in range(BS // PW):
        c0 = p * PW
        # Left-looking panel update: cols [c0, c0+PW) of the trailing
        # matrix = A - (sum over finished cols k) l_k l_k^T, restricted to
        # the panel.  lt rows >= c0 are still zero, so contracting over
        # the FULL k axis is exact and static.
        panel = a_ref[:, c0 : c0 + PW, :].astype(f32)  # (G, PW, BS)
        if p > 0:
            ltj = lt_ref[:, :, c0 : c0 + PW]  # (G, BS, PW) static lanes
            upd = jax.lax.dot_general(
                ltj,
                lt_ref[...],
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (G, PW, BS): upd[g, j, r] = sum_k lt[g,k,j0+j] lt[g,k,r]
            panel = panel - upd

        for s in range(PW // SW):
            j0 = c0 + s * SW
            sub = panel[:, s * SW : (s + 1) * SW, :]  # (G, SW, BS)
            if s > 0:
                # rank-(s*SW) update from this panel's finished sub-chunks
                ltp = lt_ref[:, c0:j0, c0 : c0 + PW]  # (G, s*SW, PW)
                ltj = ltp[:, :, s * SW : (s + 1) * SW]  # (G, s*SW, SW)
                sub = sub - jax.lax.dot_general(
                    ltj,
                    lt_ref[:, c0:j0, :],
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            cols8 = jax.lax.broadcasted_iota(jnp.int32, (1, SW, 1), 1)
            for q in range(SW):
                j = j0 + q
                col = sub[:, q, :]  # (G, BS) static sublane slice
                piv = col[:, j][:, None]  # (G, 1) static lane index
                l = jnp.where(lanes >= j, col * jax.lax.rsqrt(piv), 0.0)
                lt_ref[:, j, :] = l
                if q + 1 < SW:
                    lrow8 = l[:, j0 : j0 + SW]  # (G, SW) static lanes
                    w = jnp.where(cols8 > q, lrow8[:, :, None], 0.0)
                    sub = sub - w * l[:, None, :]

    # L = lt^T (per-G 2D transpose)
    out_ref[...] = jnp.swapaxes(lt_ref[...], -1, -2)


# Batch tile for the gridded variant.  The kernel body's instruction count
# scales with its batch extent (every op is (G, ...)-wide and the 128
# column steps are statically unrolled), so MOSAIC COMPILE TIME scales
# with G too: the monolithic form is fine at train batches (G ~ 30) but
# is a multi-minute compile bomb at eval batches (G = n_hypers*out = 200
# at notebook budgets — the dominant term of the analysis pipeline's
# ~615 s predictor compile, scripts/compile_probe.py).  Above GB the
# batch moves to a Pallas grid: the body compiles once at G = GB and the
# grid sweeps the rest, making compile time shape-independent.
GB = 32


@functools.partial(jax.jit, static_argnames=("interpret",))
def diag_chol_pallas_t(K: jax.Array, interpret: bool = False) -> jax.Array:
    """Batched lower Cholesky of (..., 128, 128) SPD blocks via the v3
    transposed-layout kernel.  Caller applies jitter."""
    batch = K.shape[:-2]
    assert K.shape[-1] == BS and K.shape[-2] == BS, K.shape
    Kb = K.reshape(-1, BS, BS).astype(jnp.float32)
    G = Kb.shape[0]
    common = dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(64 * 1024 * 1024) if not interpret else None
        ),
        interpret=interpret,
    )
    if G <= GB:
        # monolithic whole-batch program — the measured-optimal production
        # path at train shapes (0.048 ms per (30,128,128) on v5e)
        out = pl.pallas_call(
            _diag_chol_t_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, BS, BS), jnp.float32),
            scratch_shapes=[pltpu.VMEM((G, BS, BS), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=G * BS * BS * BS // 3,
                bytes_accessed=2 * 4 * G * BS * BS,
                transcendentals=G * BS,
            ),
            **common,
        )(Kb)
        return out.reshape(*batch, BS, BS).astype(K.dtype)
    # gridded: pad the batch with identity matrices (chol(I) = I, the
    # slice-back is exact) up to a GB multiple and sweep GB-wide tiles
    Gp = -(-G // GB) * GB
    if Gp != G:
        pad = jnp.broadcast_to(
            jnp.eye(BS, dtype=jnp.float32), (Gp - G, BS, BS)
        )
        Kb = jnp.concatenate([Kb, pad], axis=0)
    out = pl.pallas_call(
        _diag_chol_t_kernel,
        grid=(Gp // GB,),
        in_specs=[pl.BlockSpec((GB, BS, BS), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((GB, BS, BS), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Gp, BS, BS), jnp.float32),
        scratch_shapes=[pltpu.VMEM((GB, BS, BS), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=Gp * BS * BS * BS // 3,
            bytes_accessed=2 * 4 * Gp * BS * BS,
            transcendentals=Gp * BS,
        ),
        **common,
    )(Kb)
    return out[:G].reshape(*batch, BS, BS).astype(K.dtype)


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
