"""Pallas TPU kernel: fused Cholesky + lower-triangular inverse.

Why fused: the ELBO's critical path needs chol(K) AND L^{-1} (all whitening
solves become MXU matmuls with L^{-1}; see gpmath.linalg.tri_inv).  XLA's
TPU Cholesky/InvertDiagBlocks custom-calls are throughput-fine but
latency-poor (~0.3-0.9 ms each inside a program; measured v5e); this kernel
produces both factors in a single launch per batch of matrices:

  1. right-looking blocked Cholesky (masked-select panel loop on the VPU,
     trailing syrk on the MXU) — as in ops.pallas.chol
  2. diagonal-block inversion by 128-step masked substitution (VPU)
  3. off-diagonal inverse row-blocks X[i,:i] = -Dinv_i L[i,:i] X[:i,:i]
     via MXU matmuls

Backward (custom VJP) is pure matmul algebra using the saved (L, L^{-1}):
no triangular solves anywhere in forward or backward.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BS = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _substitution_inv(Lb):
    """Invert a (BS, BS) lower-triangular block by row-wise forward
    substitution with masked selects (no dynamic indexing)."""
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (BS, 1), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, BS), 1)

    def body(i, X):
        li = jnp.sum(jnp.where(row_ids == i, Lb, 0.0), axis=0, keepdims=True)
        lii = jnp.sum(jnp.where(col_ids == i, li, 0.0))
        s = jax.lax.dot_general(
            li, X,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
        )  # row i of (L X_partial)
        e = jnp.where(col_ids == i, 1.0, 0.0)
        xrow = (e - s) / lii
        return X + jnp.where(row_ids == i, 1.0, 0.0) * xrow

    return jax.lax.fori_loop(0, BS, body, jnp.zeros((BS, BS), jnp.float32))


def _chol_inv_kernel(a_ref, l_ref, inv_ref, work):
    S = a_ref.shape[-1]
    nb = S // BS
    work[:] = a_ref[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, BS), 1)

    # ---- blocked Cholesky into l_ref ----
    for k in range(nb):
        kc = k * BS

        def panel_step(j, carry):
            P, Lp = carry
            jj = kc + j
            colj = jnp.sum(jnp.where(col_ids == j, P, 0.0), axis=1, keepdims=True)
            piv = jnp.sum(jnp.where(row_ids == jj, colj, 0.0))
            lcol = jnp.where(row_ids >= jj, colj * jax.lax.rsqrt(piv), 0.0)
            lrow = lcol[kc : kc + BS, 0]
            P = P - lcol * jnp.where(col_ids > j, lrow[None, :], 0.0)
            Lp = Lp + lcol * jnp.where(col_ids == j, 1.0, 0.0)
            return P, Lp

        P0 = work[:, kc : kc + BS]
        _, Lp = jax.lax.fori_loop(
            0, BS, panel_step, (P0, jnp.zeros((S, BS), jnp.float32))
        )
        l_ref[0, :, kc : kc + BS] = Lp

        if k + 1 < nb:
            r = kc + BS
            T = Lp[r:, :]
            TTt = jax.lax.dot_general(
                T, T,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
            )
            work[r:, r:] = work[r:, r:] - TTt

    # ---- blocked inverse into inv_ref ----
    inv_ref[0] = jnp.zeros((S, S), jnp.float32)
    for i in range(nb):
        r0, r1 = i * BS, (i + 1) * BS
        inv_ref[0, r0:r1, r0:r1] = _substitution_inv(l_ref[0, r0:r1, r0:r1])
    for i in range(1, nb):
        r0, r1 = i * BS, (i + 1) * BS
        Li = l_ref[0, r0:r1, :r0]
        Xprev = inv_ref[0, :r0, :r0]
        prod = jax.lax.dot_general(
            Li, Xprev,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
        )
        Dinv = inv_ref[0, r0:r1, r0:r1]
        row = -jax.lax.dot_general(
            Dinv, prod,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
        )
        inv_ref[0, r0:r1, :r0] = row


def _chol_inv_call(K: jax.Array, interpret: bool = False):
    batch = K.shape[:-2]
    S = K.shape[-1]
    Kb = K.reshape(-1, S, S)
    G = Kb.shape[0]
    Sp = _round_up(max(S, BS), BS)
    if Sp != S:
        from vargp_tpu.gpmath.linalg import pad_identity_tail

        Kp = pad_identity_tail(Kb, Sp)
    else:
        Kp = Kb

    L, Linv = pl.pallas_call(
        _chol_inv_kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, Sp, Sp), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((1, Sp, Sp), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sp, Sp), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, Sp, Sp), K.dtype),
            jax.ShapeDtypeStruct((G, Sp, Sp), K.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((Sp, Sp), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * G * Sp * Sp * Sp // 3,
            bytes_accessed=3 * 4 * G * Sp * Sp,
            transcendentals=G * Sp,
        ),
        interpret=interpret,
    )(Kp)
    L = L[:, :S, :S].reshape(*batch, S, S)
    Linv = Linv[:, :S, :S].reshape(*batch, S, S)
    return L, Linv


@jax.custom_vjp
def chol_and_inv_pallas(K: jax.Array):
    """(chol(K), chol(K)^{-1}) for batched SPD K (jitter pre-applied)."""
    return _chol_inv_call(K)


def _fwd(K):
    L, Linv = _chol_inv_call(K)
    return (L, Linv), (L, Linv)


def _bwd(res, cots):
    L, Linv = res
    GL, Ginv = cots
    P = jax.lax.Precision.HIGHEST
    tril = jnp.tril(jnp.ones(L.shape[-2:], L.dtype))

    # route the inverse's cotangent onto L: d(L^{-1}) = -L^{-1} dL L^{-1}
    #   => L_bar += -(L^{-T} Ginv L^{-T}), projected to the lower triangle
    if Ginv is not None:
        extra = -jnp.einsum(
            "...ji,...jk,...lk->...il", Linv, Ginv, Linv, precision=P
        )
        GL = GL + extra * tril

    # Cholesky reverse rule (Murray 2016), solves replaced by Linv matmuls:
    #   Phi = tril(L^T GL) with halved diagonal
    #   K_bar = 0.5 * L^{-T} (Phi + Phi^T) L^{-1}
    S = jnp.einsum("...ji,...jk->...ik", L, GL, precision=P)
    Phi = S * tril - 0.5 * jnp.eye(L.shape[-1], dtype=L.dtype) * S
    sym = Phi + jnp.swapaxes(Phi, -1, -2)
    Kbar = 0.5 * jnp.einsum(
        "...ji,...jk,...kl->...il", Linv, sym, Linv, precision=P
    )
    return (Kbar,)


chol_and_inv_pallas.defvjp(_fwd, _bwd)
