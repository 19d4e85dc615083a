"""Pallas TPU kernel: batched dense Cholesky factorization.

Regime: many small/medium SPD matrices (n_hypers * out_size matrices of
size sum(M) — e.g. 30 x 300^2 for Split-MNIST task 4).  One matrix per
grid program, right-looking blocked algorithm:

  per 128-column panel: an outer-product factorization loop (VPU rank-1
  updates with row masks — sequential in the 128 panel columns, which is
  the irreducible dependency of the factorization), then one MXU
  panel-syrk for the trailing submatrix (where the S^3/3 FLOPs live).

Dynamic column indexing happens at the ref level (pl.ds) — Mosaic does not
lower value-level dynamic_slice; static block offsets are Python-unrolled.

Padding: S rounds up to 128 with an identity block, which factorizes to
itself, so the valid S x S block of the result is exact.

Replaces torch.cholesky call sites (var_gp/gp_utils.py:10 et al.) with a
TPU-native implementation; the XLA lax.linalg path remains the correctness
reference (tests/test_pallas.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BS = 128  # panel width == MXU tile


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _chol_kernel(a_ref, out_ref, work):
    # Mosaic constraint: dynamic lane indices must be 128-aligned, so the
    # column-sequential panel loop uses masked whole-panel selects/reduces
    # instead of dynamic slicing — each step is a handful of (S, BS) VPU ops.
    S = a_ref.shape[-1]
    nb = S // BS
    work[:] = a_ref[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, BS), 1)

    for k in range(nb):  # static unroll over panels
        kc = k * BS

        def panel_step(j, carry):
            P, Lp = carry
            jj = kc + j
            colj = jnp.sum(jnp.where(col_ids == j, P, 0.0), axis=1, keepdims=True)
            piv = jnp.sum(jnp.where(row_ids == jj, colj, 0.0))
            lcol = jnp.where(row_ids >= jj, colj * jax.lax.rsqrt(piv), 0.0)
            # rank-1 update of the remaining panel columns (c > j)
            lrow = lcol[kc : kc + BS, 0]  # static slice: this panel's rows
            P = P - lcol * jnp.where(col_ids > j, lrow[None, :], 0.0)
            Lp = Lp + lcol * jnp.where(col_ids == j, 1.0, 0.0)
            return P, Lp

        P0 = work[:, kc : kc + BS]
        _, Lp = jax.lax.fori_loop(
            0, BS, panel_step, (P0, jnp.zeros((S, BS), jnp.float32))
        )
        out_ref[0, :, kc : kc + BS] = Lp

        if k + 1 < nb:
            # trailing syrk on the MXU: A[r:, r:] -= T T^T
            r = kc + BS
            T = Lp[r:, :]  # (S - r, BS)
            TTt = jax.lax.dot_general(
                T, T,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
            )
            work[r:, r:] = work[r:, r:] - TTt


@functools.partial(jax.jit, static_argnames=("interpret",))
def cholesky_pallas(K: jax.Array, interpret: bool = False) -> jax.Array:
    """Batched lower Cholesky of SPD matrices; K: ... x S x S (jitter must
    already be applied by the caller, matching jnp.linalg.cholesky)."""
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

    out = pl.pallas_call(
        _chol_kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, Sp, Sp), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, Sp, Sp), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((G, Sp, Sp), K.dtype),
        scratch_shapes=[pltpu.VMEM((Sp, Sp), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=G * Sp * Sp * Sp // 3,
            bytes_accessed=2 * 4 * G * Sp * Sp,
            transcendentals=G * Sp,
        ),
        interpret=interpret,
    )(Kp)
    return out[:, :S, :S].reshape(*batch, S, S)
