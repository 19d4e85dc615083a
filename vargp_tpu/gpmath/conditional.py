"""Sparse-GP conditionals and the auto-regressive joint posterior.

Two API levels:

1. Reference-parity primitives (``gp_cond``, ``linear_joint``,
   ``linear_marginal_diag``) mirroring var_gp/gp_utils.py:68-191 — used by
   the global-SVGP / retrain models and as test oracles.

2. The fused TPU-first path (``ar_joint_posterior`` +
   ``whitened_marginal_diag``).  Key identity: for the auto-regressive
   chain q(u_{<=t}|th) built by repeated ``linear_joint`` folds
   (var_gp/vargp.py:35-88), the joint covariance has the closed-form block
   factor

       chol(S_join) = [[chol(S_prev), 0], [A chol(S_prev), u_tril_t]],

   and every per-task projection A_t = K_{t,<t} K_{<t}^{-1} is expressible
   through sub-blocks of ONE Cholesky of the full inducing Gram matrix
   (chol of a leading principal sub-block == leading block of the chol).
   So the whole chain costs one batched ``(sum M)^3`` factorization instead
   of the reference's per-task growing Choleskys plus chol(S) plus
   chol(prior_cov) — identical math, far fewer FLOPs, and one big
   MXU-friendly kernel instead of many small ones.
"""

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from vargp_tpu.gpmath.linalg import (
    _HIGHEST,
    cholesky,
    mm,
    mm_h,
    mtm,
    mtm_h,
    rows2_blocks,
    tri3_blocks,
    tri_half_split,
    tri_solve,
)


# ---------------------------------------------------------------------------
# Reference-parity primitives
# ---------------------------------------------------------------------------


def gp_cond(u, Kzz, Kzx, Kxx, Lz=None, Lz_Kzx=None):
    """Whitened GP conditional p(f|u): mu = Kxz Kzz^{-1} u,
    Sigma = Kxx - Kxz Kzz^{-1} Kzx.  (Parity: gp_utils.py:68-98.)

    u: ... x M x 1;  Kzz: ... x M x M;  Kzx: ... x M x N;  Kxx: ... x N x N.
    Returns mu: ... x N x 1, Sigma: ... x N x N.
    """
    if Lz is None:
        Lz = cholesky(Kzz)
    Lz_u = tri_solve(Lz, u)
    if Lz_Kzx is None:
        Lz_Kzx = tri_solve(Lz, Kzx)
    mu = jnp.einsum("...ij,...ik->...jk", Lz_Kzx, Lz_u, precision=_HIGHEST)
    Sigma = Kxx - jnp.einsum(
        "...ij,...ik->...jk", Lz_Kzx, Lz_Kzx, precision=_HIGHEST
    )
    return mu, Sigma


def linear_joint(m, S, Kzx, Kzz, V, b):
    """Joint of N(z; m, S) N(x; Az + b, V) with A = Kxz Kzz^{-1}:
    mu = [m, Am + b], Sigma = [[S, SA^T], [AS, V + A S A^T]].
    (Parity: gp_utils.py:101-147.)
    """
    Lz = cholesky(Kzz)
    Lz_m = tri_solve(Lz, m)
    Lz_Kzx = tri_solve(Lz, Kzx)

    Am = jnp.einsum("...ij,...ik->...jk", Lz_Kzx, Lz_m, precision=_HIGHEST)
    Lz_S = tri_solve(Lz, jnp.broadcast_to(S, jnp.broadcast_shapes(S.shape, Lz.shape)))
    AS = jnp.einsum("...ij,...ik->...jk", Lz_Kzx, Lz_S, precision=_HIGHEST)
    SAt = jnp.swapaxes(AS, -2, -1)
    Lz_SAt = tri_solve(Lz, SAt)
    ASAt = jnp.einsum("...ij,...ik->...jk", Lz_SAt, Lz_Kzx, precision=_HIGHEST)

    mu = jnp.concatenate([jnp.broadcast_to(m, Am.shape[:-2] + m.shape[-2:]), Am + b], axis=-2)
    top = jnp.concatenate([jnp.broadcast_to(S, AS.shape[:-2] + S.shape[-2:]), SAt], axis=-1)
    bot = jnp.concatenate([AS, V + ASAt], axis=-1)
    Sigma = jnp.concatenate([top, bot], axis=-2)
    return mu, Sigma


class MarginalCache(NamedTuple):
    Lz: jax.Array
    Lz_Kzx: jax.Array


def linear_marginal_diag(m, S, Kzz, Kzx, Kxx_diag, *, return_cache=False):
    """Diagonal marginal of the linear-Gaussian product:
    mu = A m, var = Kxx_diag - diag(A Kzx) + diag(A S A^T).
    (Parity: gp_utils.py:150-191.)
    """
    Lz = cholesky(Kzz)
    Lz_m = tri_solve(Lz, m)
    Lz_Kzx = tri_solve(Lz, Kzx)

    mu = jnp.einsum("...ij,...ik->...jk", Lz_Kzx, Lz_m, precision=_HIGHEST)[..., 0]
    diag1 = jnp.sum(jnp.square(Lz_Kzx), axis=-2)
    Lz_LS = tri_solve(Lz, cholesky(S))
    C = jnp.einsum("...ij,...ik->...jk", Lz_LS, Lz_Kzx, precision=_HIGHEST)
    diag2 = jnp.sum(jnp.square(C), axis=-2)
    var = Kxx_diag - diag1 + diag2

    if return_cache:
        return mu, var, MarginalCache(Lz=Lz, Lz_Kzx=Lz_Kzx)
    return mu, var


# ---------------------------------------------------------------------------
# Fused TPU-first path
# ---------------------------------------------------------------------------


class ARPosterior(NamedTuple):
    """Joint AR variational posterior q(u_{<=t} | theta) = N(mean, LS LS^T).

    mean: ... x (sum M) x 1
    LS:   ... x (sum M) x (sum M) block-lower-triangular scale factor.
    Leading principal blocks of (mean, LS) are exactly the prefix posteriors
    q(u_{<tau}) — no extra work needed to marginalize.
    """

    mean: jax.Array
    LS: jax.Array


def ar_joint_posterior(
    L_full: jax.Array,
    u_means: Sequence[jax.Array],
    u_trils: Sequence[jax.Array],
    L_inv: jax.Array | None = None,
) -> ARPosterior:
    """Fold the auto-regressive chain into (mean, scale_tril) of
    q(u_{<=t}|theta) using only sub-blocks of the full-Gram Cholesky.

    Arguments:
      L_full:  ... x (sum M) x (sum M), chol(K_zz_all + jitter) over ALL
               tasks' inducing points in task order.
      u_means: per-task ... x M_t x 1 variational means.
      u_trils: per-task ... x M_t x M_t variational scale factors.

    The task loop is a static Python unroll (task count <= ~10; one XLA
    program per task index), matching the recursion of vargp.py:61-80 but
    with all solves against constant-offset blocks of one factorization.
    """
    sizes = [u.shape[-2] for u in u_means]
    batch = jnp.broadcast_shapes(
        L_full.shape[:-2], *[u.shape[:-2] for u in u_means]
    )
    dtype = L_full.dtype

    c = sizes[0]
    mean = jnp.broadcast_to(u_means[0], (*batch, sizes[0], 1))
    LS = jnp.broadcast_to(u_trils[0], (*batch, sizes[0], sizes[0]))

    for t in range(1, len(sizes)):
        Mt = sizes[t]
        L11 = L_full[..., :c, :c]
        L21 = L_full[..., c : c + Mt, :c]
        # One solve serves both the mean and the scale factor: A X = L21 L11^{-1} X.
        rhs = jnp.concatenate([mean, LS], axis=-1)
        if L_inv is not None:
            # matmul path: leading block of L^{-1} is the inverse of L11.
            # bf16x3 both ways: the fold's outputs feed MC-sampled draws
            # and KL terms whose end-to-end tolerance is pinned by the
            # Split-Digits reproduction check.
            w = mm_h(L_inv[..., :c, :c], rhs)
        else:
            w = tri_solve(L11, rhs)
        AX = mm_h(L21, w)
        mean = jnp.concatenate(
            [mean, AX[..., :1] + u_means[t]], axis=-2
        )
        zeros = jnp.zeros((*batch, c, Mt), dtype=dtype)
        top = jnp.concatenate([LS, zeros], axis=-1)
        bot = jnp.concatenate(
            [AX[..., 1:], jnp.broadcast_to(u_trils[t], (*batch, Mt, Mt))], axis=-1
        )
        LS = jnp.concatenate([top, bot], axis=-2)
        c += Mt

    return ARPosterior(mean=mean, LS=LS)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _diag_blocks(A: jax.Array, T: int, M: int) -> jax.Array:
    """Diagonal M-blocks of ``A``: (..., T*M, T*M) -> (..., T, M, M).

    Forward: static slices + stack (cheap strided reads).  Backward: the AD
    transpose of those slices is T full-matrix pads summed pairwise —
    T x 120 MB of HBM writes per step at the S=1000 chain (jaxpr movement
    audit, scripts/flops_audit.py).  The hand VJP materializes the same
    block-diagonal cotangent ONCE via an eye-mask broadcast-multiply whose
    (..., T, M, T, M) product reshapes straight to (..., S, S) in row-major
    order.  Exact: entries are g*1 on the diagonal blocks and g*0 = +0.0
    elsewhere, matching pad's zero fill.
    """
    return jnp.stack(
        [A[..., t * M : (t + 1) * M, t * M : (t + 1) * M] for t in range(T)],
        axis=-3,
    )


def _diag_blocks_fwd(A, T, M):
    return _diag_blocks(A, T, M), None


# Above this chain size the eye-mask build's (..., T, M, T, M) canvas is
# replaced by concat assembly: at S=5120 (M=1024 x 5 tasks) the canvas
# allocates 2.93G unpadded / 4.69G tile-padded (the second-minor T dim
# pads 5 -> 8) plus a separate 2.93G reshape copy — which OOMs the
# 16G v5e.  Kept >= the measured S=1000/M=1024-single-task regimes so
# their recorded floors/steps are untouched.
_DIAG_BLOCKS_CONCAT_MIN_S = 2048


def _diag_blocks_bwd_concat(T: int, M: int, g: jax.Array) -> jax.Array:
    """Block-diagonal cotangent via concat assembly: ONE (..., S, S)
    materialization in final layout, no (T, M, T, M) canvas and no
    reshape copy.  Entries are exactly g on the diagonal blocks and +0.0
    elsewhere — bitwise-equal to the eye-mask build (tested)."""
    batch = g.shape[:-3]
    rows = []
    for t in range(T):
        blocks = []
        if t > 0:
            blocks.append(jnp.zeros((*batch, M, t * M), g.dtype))
        blocks.append(g[..., t, :, :])
        if t < T - 1:
            blocks.append(jnp.zeros((*batch, M, (T - 1 - t) * M), g.dtype))
        rows.append(blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks, axis=-1))
    return jnp.concatenate(rows, axis=-2)


def _diag_blocks_bwd(T, M, _res, g):
    if T * M >= _DIAG_BLOCKS_CONCAT_MIN_S:
        return (_diag_blocks_bwd_concat(T, M, g),)
    eye = jnp.eye(T, dtype=g.dtype)
    big = eye[:, None, :, None] * g[..., :, :, None, :]
    dA = big.reshape(*g.shape[:-3], T * M, T * M)
    return (dA,)


_diag_blocks.defvjp(_diag_blocks_fwd, _diag_blocks_bwd)


def ar_joint_posterior_fast(
    L_full: jax.Array,
    L_inv: jax.Array,
    u_means: Sequence[jax.Array],
    u_trils: Sequence[jax.Array],
) -> ARPosterior:
    """Closed-form AR joint posterior — no sequential task joins.

    Identity: the block-LDL factor of K is G = L . blockdiag(L_tt)^{-1}
    (unit-block-lower; its rows are the regression coefficients of each
    task block on its prefix), and the AR recursion's propagation matrix
    IS G.  Hence

        mean = G b              = L . (blockdiag(inv(L_tt)) b)
        LS   = G blockdiag(Vt)  = L . blockdiag(inv(L_tt) u_tril_t)

    where inv(L_tt) are the diagonal M-blocks of L^{-1} (block-triangular
    inverse property).  Two matmuls replace the T-step fold of
    ``ar_joint_posterior`` — exact same result (tested), far better TPU
    critical path.
    """
    sizes = [u.shape[-2] for u in u_means]
    batch = jnp.broadcast_shapes(
        L_full.shape[:-2], *[u.shape[:-2] for u in u_means]
    )
    S = sum(sizes)
    T = len(sizes)
    M = sizes[0]

    if T == 1:
        # single block: G = L . blockdiag(L^{-1}) = I, so the fold is the
        # identity — q(u_0) is exactly N(u_mean, u_tril u_tril^T).  Skipping
        # the two matmuls is both exact (no bf16x3 round-trip) and removes
        # ~25% of the M=1024 single-task step's matmul FLOPs (flops_audit).
        # Parity: the reference also special-cases task 0 (vargp.py:156-173).
        return ARPosterior(
            mean=jnp.broadcast_to(u_means[0], (*batch, M, 1)),
            LS=jnp.broadcast_to(u_trils[0], (*batch, M, M)),
        )

    if any(m != M for m in sizes):
        # unequal block sizes (e.g. grown global chains): generic fold
        return ar_joint_posterior(L_full, u_means, u_trils, L_inv=L_inv)

    # stacked per-task quantities, block axis leading: (T, *batch, M, .)
    um = jnp.stack([jnp.broadcast_to(u, (*batch, M, 1)) for u in u_means])
    ut = jnp.stack([jnp.broadcast_to(u, (*batch, M, M)) for u in u_trils])
    Lb_full = jnp.broadcast_to(L_full, (*batch, S, S))
    Li_full = jnp.broadcast_to(L_inv, (*batch, S, S))

    # diagonal M-blocks of L^{-1} (T, *batch, M, M): _diag_blocks' hand VJP
    # builds the block-diagonal cotangent in one materialization
    Dinv = jnp.moveaxis(_diag_blocks(Li_full, T, M), -3, 0)

    w = mm_h(Dinv, ut)
    v = mm_h(Dinv, um)

    # column blocks of L: (T, *batch, S, M)
    Lb = jnp.moveaxis(Lb_full.reshape(*batch, S, T, M), -2, 0)

    # LS block-columns and the summed mean, all in one batched matmul each
    LS_blocks = mm_h(Lb, w)
    LS = jnp.moveaxis(LS_blocks, 0, -2).reshape(*batch, S, S)
    mean = jnp.einsum("t...sm,t...mk->...sk", Lb, v, precision=_HIGHEST)
    return ARPosterior(mean=mean, LS=LS)


class ARFactored(NamedTuple):
    """AR joint posterior q(u_{<=t}|theta) in WHITENED factored form.

    The closed-form block-LDL identity (see ``ar_joint_posterior_fast``)
    gives LS = L . blockdiag(w_t) with w_t = inv(L_tt) u_tril_t — so the
    whitened scale factor L^{-1} LS that every downstream consumer
    actually needs is EXACTLY blockdiag(w).  This form never materializes
    the (sum M)^2 LS: it skips the L @ blockdiag(w) assembly (plus its two
    (T, ..., S, M) <-> (..., S, S) relayout transposes — 2 x 120 MB/step at
    the S=1000 chain) AND the marginal's L^{-1} @ LS un-whitening matmuls,
    which multiplied by L only to immediately multiply by its inverse.

    The MEAN is whitened too: v = L^{-1} mean = stack_t(inv(L_tt) b_t)
    comes straight out of the construction, and every consumer (the
    marginal's Lm, the prefix-sampling branch) needs exactly v — storing
    the un-whitened mean would re-introduce an L @ v / L^{-1} @ (L v)
    round trip per consumer (one full (S, S) HBM read each at the S=1000
    chain, plus bf16x3 round-trip error).  Recover the un-whitened mean
    as ``mm(L, v)`` if ever needed.

    v: ... x S x 1 WHITENED mean;  w: ... x T x M x M (block axis BEFORE
    the matrix axes so every consumer is a clean batched matmul, no
    transposes).
    """

    v: jax.Array
    w: jax.Array


def ar_joint_posterior_factored(
    L_full: jax.Array,
    L_inv: jax.Array,
    u_means: Sequence[jax.Array],
    u_trils: Sequence[jax.Array],
) -> ARFactored:
    """Whitened-factored AR joint posterior (equal task blocks, T >= 2).

    Same math as ``ar_joint_posterior_fast`` (tested against it): only the
    representation differs — blockdiag(w) is returned instead of L @
    blockdiag(w).  Callers consume w via
    ``whitened_marginal_diag_factored`` and the factored prefix-sampling
    path in models.vargp.forward.
    """
    sizes = [u.shape[-2] for u in u_means]
    M = sizes[0]
    T = len(sizes)
    S = sum(sizes)
    assert T >= 2 and all(m == M for m in sizes), sizes
    batch = jnp.broadcast_shapes(
        L_full.shape[:-2], *[u.shape[:-2] for u in u_means]
    )

    # per-task stacks with the block axis inserted at -3 (batch position):
    # (O, M, .) entries -> (O, T, M, .), broadcast over hypers by the dots.
    # Entries broadcast to their COMMON batch first (NOT the full posterior
    # batch — that would materialize per-hyper copies): heterogeneous
    # per-task batch dims must work here exactly as they do in the
    # fast/materialized forms, or the default form becomes a shape trap.
    um_b = jnp.broadcast_shapes(*[u.shape[:-2] for u in u_means])
    ut_b = jnp.broadcast_shapes(*[u.shape[:-2] for u in u_trils])
    um = jnp.stack(
        [jnp.broadcast_to(u, (*um_b, M, 1)) for u in u_means], axis=-3
    )
    ut = jnp.stack(
        [jnp.broadcast_to(u, (*ut_b, M, M)) for u in u_trils], axis=-3
    )
    # diagonal M-blocks of L^{-1}: _diag_blocks' hand VJP replaces the T
    # full-matrix pad cotangents with one fused block-diagonal build
    Dinv = _diag_blocks(L_inv, T, M)
    w = mm_h(Dinv, ut)  # (..., T, M, M)
    v = mm_h(Dinv, um)  # (..., T, M, 1)

    # whitened mean v = L^{-1} (G b) = stack_t(inv(L_tt) b_t) directly —
    # the (..., T, M, 1) -> (..., S, 1) reshape is a free axis merge.
    v_full = jnp.broadcast_to(v, (*batch, T, M, 1)).reshape(*batch, S, 1)
    return ARFactored(v=v_full, w=jnp.broadcast_to(w, (*batch, T, M, M)))


def whitened_marginal_diag_factored(
    L_inv: jax.Array,
    v_mean: jax.Array,
    w: jax.Array,
    Kzx: jax.Array,
    Kxx_diag: jax.Array,
):
    """Diagonal predictive marginal from the whitened-factored posterior.

    Identical math to ``whitened_marginal_diag`` with LS = L blockdiag(w):
    there C = (L^{-1} LS)^T (L^{-1} Kzx) — and L^{-1} LS == blockdiag(w)
    exactly, so the dense (S, S) C-product collapses to T batched
    (M, M)^T @ (M, B) blocks (1/T of the FLOPs, zero relayout).  The mean
    arrives already whitened (``ARFactored.v``), so Lm is a free alias
    rather than an (S, S) solve/matmul.
    """
    T, M = w.shape[-3], w.shape[-1]
    Lm = v_mean
    W = mm_h(L_inv, Kzx)  # (..., S, B)
    f_mean = jnp.einsum("...mi,...mb->...b", Lm, W, precision=_HIGHEST)
    diag1 = jnp.sum(jnp.square(W), axis=-2)
    # (..., S, B) -> (..., T, M, B): free contiguous split of the row axis
    W4 = W.reshape(*W.shape[:-2], T, M, W.shape[-1])
    C = mtm_h(w, W4)  # (..., T, M, B)
    diag2 = jnp.sum(jnp.square(C), axis=(-3, -2))
    # clamp rationale: see whitened_marginal_diag
    f_var = jnp.maximum(Kxx_diag - diag1 + diag2, 0.0)
    return f_mean, f_var


def whitened_marginal_diag(
    L: jax.Array,
    mean: jax.Array,
    LS: jax.Array,
    Kzx: jax.Array,
    Kxx_diag: jax.Array,
    L_inv: jax.Array | None = None,
):
    """Diagonal predictive marginal given a precomputed Gram Cholesky and an
    exact posterior scale factor (no chol(S) needed, unlike
    linear_marginal_diag).

      f_mean = Kxz K^{-1} mean
      f_var  = Kxx_diag - diag(Kxz K^{-1} Kzx) + diag(Kxz K^{-1} S K^{-1} Kzx)

    All three whitened solves are batched into a single triangular solve.

    Shapes: L, LS: ... x M x M;  mean: ... x M x 1;  Kzx: ... x M x B;
    Kxx_diag: broadcastable to ... x B.  Returns (f_mean, f_var): ... x B.
    """
    M = L.shape[-1]
    batch = jnp.broadcast_shapes(
        L.shape[:-2], LS.shape[:-2], mean.shape[:-2], Kzx.shape[:-2]
    )
    diag2 = None
    if L_inv is not None:
        # separate MXU dots: concatenating the three right-hand sides into
        # one (M, 1+M+B) block costs a 0.2 ms copy on TPU and buys nothing
        # when the solve is a matmul against L^{-1}.  bf16x3 both ways:
        # these feed only the predictive marginal, whose downstream use is
        # n_f-sampled softmax draws — MC noise dwarfs bf16x3 rounding.
        Lm = mm_h(L_inv, mean)
        W = mm_h(L_inv, Kzx)
        h = tri_half_split(M)
        if h is not None:
            # L_inv and LS are both lower-triangular: block-skip the
            # structurally-zero upper of LLS = L_inv LS and contract the
            # C = LLS^T W product per block row (no assembled LLS needed)
            # — half + a quarter of those two dots' FLOPs at M >= 512.
            # Shape-gated: parity protocols (M <= 300) are untouched.
            # diag2 only; the epilogue below is shared with every branch.
            # tri3_blocks/rows2_blocks: hand VJPs assemble each cotangent
            # once (vs per-slice full pads summed — movement audit)
            a1, a2, a3 = tri3_blocks(L_inv, h)
            s1, s2, s3 = tri3_blocks(LS, h)
            M11 = mm_h(a1, s1)
            M21 = mm_h(a2, s1) + mm_h(a3, s2)
            M22 = mm_h(a3, s3)
            W1, W2 = rows2_blocks(W, h)
            Ctop = mtm_h(M11, W1) + mtm_h(M21, W2)
            Cbot = mtm_h(M22, W2)
            diag2 = jnp.sum(jnp.square(Ctop), axis=-2) + jnp.sum(
                jnp.square(Cbot), axis=-2
            )
        else:
            LLS = mm_h(L_inv, LS)
    else:
        # triangular-solve path: one batched solve for all three
        rhs = jnp.concatenate(
            [
                jnp.broadcast_to(mean, (*batch, *mean.shape[-2:])),
                jnp.broadcast_to(LS, (*batch, *LS.shape[-2:])),
                jnp.broadcast_to(Kzx, (*batch, *Kzx.shape[-2:])),
            ],
            axis=-1,
        )
        sol = tri_solve(L, rhs)
        Lm, LLS, W = sol[..., :1], sol[..., 1 : 1 + M], sol[..., 1 + M :]

    f_mean = jnp.einsum("...mi,...mb->...b", Lm, W, precision=_HIGHEST)
    diag1 = jnp.sum(jnp.square(W), axis=-2)
    if diag2 is None:
        C = mtm_h(LLS, W)
        diag2 = jnp.sum(jnp.square(C), axis=-2)
    # Clamp: when a test point is near an inducing point the conditional
    # variance is ~0 and bf16x3 rounding in the L_inv branch can push
    # Kxx_diag - diag1 + diag2 slightly negative, producing NaN in the
    # sqrt downstream (softmax_sample_logits).  Exact-arithmetic value is
    # >= diag2 >= 0, so the clamp never changes a well-conditioned result.
    f_var = jnp.maximum(Kxx_diag - diag1 + diag2, 0.0)
    return f_mean, f_var
