"""Batched dense linear algebra for sparse-GP math.

Thin, broadcasting-aware wrappers over ``jax.lax.linalg`` (which XLA batches
natively on TPU) plus the jitter conventions of the reference
(var_gp/gp_utils.py:5-19).  The Pallas fast paths live in
``vargp_tpu.ops`` and are swapped in behind the same call signatures.
"""

import functools
import os

import jax
import jax.numpy as jnp

DEFAULT_JITTER = 1e-4

# GP solves are precision-critical: force f32 MXU accumulation everywhere.
_HIGHEST = jax.lax.Precision.HIGHEST

# Cotangent (backward) matmuls run at HIGH (bf16x3) by default: the ELBO
# gradient is a Monte-Carlo estimate (n_var_samples * n_f samples per
# step), so bf16x3 rounding (~f32-comparable for moderate ranges) is far
# below the sampling noise floor — and the backward dot_generals are the
# single largest slice of the training step (device trace: 2.56 ms of a
# 6.09 ms step at HIGHEST; HIGH halves them).  Forward solves stay f32.
# Revert with VARGP_TPU_BWD_MATMUL=highest.
def _bwd_precision_from_env() -> jax.lax.Precision:
    val = os.environ.get("VARGP_TPU_BWD_MATMUL", "high").lower()
    if val == "highest":
        return _HIGHEST
    if val == "high":
        return jax.lax.Precision.HIGH
    raise ValueError(
        f"VARGP_TPU_BWD_MATMUL={val!r}: expected 'high' or 'highest'"
    )


_BWD = _bwd_precision_from_env()


def add_jitter(K: jax.Array, eps: float = DEFAULT_JITTER) -> jax.Array:
    """K + eps*I on the trailing two dims (PSD safety margin)."""
    m = K.shape[-1]
    return K + eps * jnp.eye(m, dtype=K.dtype)


def cholesky(K: jax.Array, eps: float = DEFAULT_JITTER) -> jax.Array:
    """Lower Cholesky factor of K + eps*I (parity: gp_utils.py:5-11).
    Routed through ops dispatch so the Pallas TPU path can take over."""
    from vargp_tpu.ops.dispatch import batched_cholesky

    return batched_cholesky(add_jitter(K, eps))


def rev_cholesky(L: jax.Array) -> jax.Array:
    """L @ L^T (parity: gp_utils.py:14-19)."""
    return jnp.einsum("...ij,...kj->...ik", L, L, precision=_HIGHEST)


def _broadcast_batch(a: jax.Array, b: jax.Array):
    """Broadcast the leading (batch) dims of two matrices to a common shape."""
    batch = jnp.broadcast_shapes(a.shape[:-2], b.shape[:-2])
    a = jnp.broadcast_to(a, (*batch, *a.shape[-2:]))
    b = jnp.broadcast_to(b, (*batch, *b.shape[-2:]))
    return a, b


def tri_solve(L: jax.Array, B: jax.Array, *, transpose: bool = False) -> jax.Array:
    """Solve L X = B (or L^T X = B) with L lower-triangular, batched with
    broadcasting over leading dims."""
    L, B = _broadcast_batch(L, B)
    return jax.lax.linalg.triangular_solve(
        L, B, left_side=True, lower=True, transpose_a=transpose
    )


def chol_solve(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve (L L^T) X = B given the lower Cholesky factor L."""
    return tri_solve(L, tri_solve(L, B), transpose=True)


_TRI_INV_BLOCK = 128


def _tri_inv_newton(L: jax.Array) -> jax.Array:
    """Exact lower-triangular inverse by Newton-Schulz, pure matmuls.

    With X0 = diag(L)^{-1}, the residual E0 = I - L X0 is STRICTLY lower
    triangular, hence nilpotent with index <= n; the iteration
    X <- X (2I - L X) squares the residual (E <- E^2), so after
    ceil(log2(n)) steps the inverse is exact up to rounding — every step is
    an MXU matmul, avoiding XLA's latency-heavy InvertDiagBlocks /
    TriangularSolve custom-calls on TPU entirely.
    """
    n = L.shape[-1]
    steps = max(1, (n - 1).bit_length())
    eye = jnp.eye(n, dtype=L.dtype)
    inv_d = 1.0 / jnp.diagonal(L, axis1=-2, axis2=-1)
    X = eye * inv_d[..., :, None]
    two_eye = 2.0 * eye
    # Intermediate iterations run bf16x3 (HIGH): the final HIGHEST pass is
    # one more Newton contraction, so it polishes the bf16x3 residual
    # (~4e-5) back to f32 exactness (measured 1.8e-7 vs 1.2e-7 all-HIGHEST
    # at (90,128,128)) at ~0.6x the cost.
    high = jax.lax.Precision.HIGH
    for s in range(steps):
        p = _HIGHEST if s == steps - 1 else high
        LX = jnp.einsum("...ij,...jk->...ik", L, X, precision=p)
        X = jnp.einsum("...ij,...jk->...ik", X, two_eye - LX, precision=p)
    return X


def _diag_chol(A: jax.Array) -> jax.Array:
    """Batched Cholesky of (..., S, S) diagonal blocks with S <= 128.

    On TPU this routes through the Pallas batch-vectorized kernel
    (ops.pallas.chol_panel.diag_chol_pallas_t, 0.048 ms vs XLA's 0.42 ms
    per (30,128,128) on v5e — the XLA custom-call factorizes its 64-wide
    panels matrix-by-matrix, the kernel vectorizes every column step over
    the whole batch).  S < 128 blocks are identity-padded: chol of
    blockdiag(K, I) is blockdiag(chol K, I), so the slice-back is exact.
    Elsewhere (CPU tests, GPU) it is jnp.linalg.cholesky.
    Opt out with VARGP_TPU_DIAG_CHOL=xla.

    Multi-device: routed through a custom_partitioning wrapper so the
    leading (hyper, class) batch axes stay sharded over the mesh instead
    of the opaque kernel call being replicated (ops.partition).
    """
    from vargp_tpu.ops.partition import diag_chol_partitioned, partition_enabled

    if partition_enabled():
        return diag_chol_partitioned(A)
    return _diag_chol_impl(A)


def _diag_chol_impl(A: jax.Array) -> jax.Array:
    """Backend-dispatching body of ``_diag_chol`` (no partitioning)."""
    S = A.shape[-1]
    knob = os.environ.get("VARGP_TPU_DIAG_CHOL", "auto")
    if knob not in ("auto", "xla"):
        # a typo must not silently keep the Pallas kernel (same loud-fail
        # contract as VARGP_TPU_BWD_MATMUL / VARGP_TPU_AR_FORM)
        raise ValueError(
            f"VARGP_TPU_DIAG_CHOL={knob!r}: expected 'auto' or 'xla'"
        )
    if S > 128 or knob == "xla":
        return jnp.linalg.cholesky(A)
    from vargp_tpu.ops.dispatch import get_backend

    if get_backend() != "pallas":
        return jnp.linalg.cholesky(A)
    from vargp_tpu.ops.pallas.chol_panel import BS, diag_chol_pallas_t

    if S == BS:
        return diag_chol_pallas_t(A)
    Lp = diag_chol_pallas_t(pad_identity_tail(A, BS))
    return Lp[..., :S, :S]


def pad_identity_tail(A: jax.Array, Sp: int) -> jax.Array:
    """Pad ``... x S x S`` up to ``... x Sp x Sp`` with an identity tail:
    the Cholesky / triangular inverse of blockdiag(A, I) is
    blockdiag(op(A), I), so slicing the leading S x S block back out is
    EXACT (tested).  jnp.pad + a constant diag-tail add lowers to a cheap
    pad op; the .at[].set formulation costs a ~10x-slower
    dynamic-update-slice on TPU (device trace)."""
    S = A.shape[-1]
    npad = Sp - S
    pad_width = [(0, 0)] * (A.ndim - 2) + [(0, npad), (0, npad)]
    tail = jnp.diag(
        jnp.concatenate([jnp.zeros((S,), A.dtype), jnp.ones((npad,), A.dtype)])
    )
    return jnp.pad(A, pad_width) + tail


def _tri_inv_rows(L, dinv_of, nb: int, block: int, Sp: int, batch, dtype):
    """Contribution-accumulation row-block assembly of a block-lower-
    triangular inverse (shared by tri_inv and chol_and_inv_blocked):

        X[i,i] = dinv_i;   X[i,:i] = -dinv_i (sum_j L[i,j] X[j,:i])

    Each finished row is kept FULL WIDTH (zeros beyond its block column),
    so row i's prefix product is a plain sum of block x r0 matmuls over
    finished rows — no intermediate X materialization, no scatter.  A
    growing jnp.concatenate carry copies O(nb^2) row blocks (measured
    +33% on the M=1024 step at nb=8); .at[].set scatters cost ~10x per
    byte.  This form copies each row exactly twice (its own 3-piece
    concat + the final stack).  ``dinv_of(i)`` returns inv(L[i,i])."""
    def full_row(i, row_left):
        r1 = (i + 1) * block
        parts = ([row_left] if i else []) + [dinv_of(i)]
        if Sp - r1:
            parts.append(jnp.zeros((*batch, block, Sp - r1), dtype))
        return jnp.concatenate(parts, axis=-1)

    rows = [full_row(0, None)]
    for i in range(1, nb):
        r0, r1 = i * block, (i + 1) * block
        acc = None
        for j in range(i):
            Lij = L[..., r0:r1, j * block : (j + 1) * block]
            contrib = jnp.einsum(
                "...ij,...jk->...ik", Lij, rows[j][..., :r0], precision=_HIGHEST
            )
            acc = contrib if acc is None else acc + contrib
        row_left = -jnp.einsum(
            "...ij,...jk->...ik", dinv_of(i), acc, precision=_HIGHEST
        )
        rows.append(full_row(i, row_left))
    return jnp.concatenate(rows, axis=-2)


def chol_and_inv_blocked(K: jax.Array, block_m: int):
    """Joint blocked Cholesky + triangular inverse exploiting a known block
    size (e.g. per-task inducing blocks of the AR chain).

    XLA's monolithic Cholesky custom-call pays per-128-panel latency; when
    the natural block size is known, T small batched Cholesky calls plus
    MXU matmuls (column solve via Newton-inverted diagonal blocks, trailing
    syrk, and the standard block inverse assembly) beat it on the TPU
    critical path.  Returns (L, L^{-1}).
    """
    S = K.shape[-1]
    assert S % block_m == 0, (S, block_m)
    T = S // block_m
    if T == 1:
        L = _diag_chol(K) if S <= 128 else jnp.linalg.cholesky(K)
        return L, _tri_inv_newton(L)

    mmT = lambda a, b: jnp.einsum("...ij,...kj->...ik", a, b, precision=_HIGHEST)
    batch = K.shape[:-2]

    # factorization: keep the trailing submatrix and the finished column
    # blocks as separate arrays, assembled by concatenation at the end —
    # .at[].set/.add scatters cost ~0.6 ms/step on TPU (device trace)
    A = K  # current trailing submatrix, shrinking by block_m per step
    cols = []  # finished (S - r0) x block_m column blocks of L
    dinvs = []
    for t in range(T):
        Ld = _diag_chol(A[..., :block_m, :block_m])
        Dinv = _tri_inv_newton(Ld)
        dinvs.append(Dinv)
        if t + 1 < T:
            C = A[..., block_m:, :block_m]
            Lcol = mmT(C, Dinv)  # C Ld^{-T}
            cols.append(jnp.concatenate([Ld, Lcol], axis=-2))
            A = A[..., block_m:, block_m:] - mmT(Lcol, Lcol)
        else:
            cols.append(Ld)

    def pad_col(c, t):
        top = jnp.zeros((*batch, t * block_m, block_m), K.dtype)
        return jnp.concatenate([top, c], axis=-2) if t else c

    L = jnp.concatenate([pad_col(c, t) for t, c in enumerate(cols)], axis=-1)

    # inverse: shared contribution-accumulation row assembly (see
    # _tri_inv_rows for the scatter-free / no-growing-concat rationale)
    X = _tri_inv_rows(
        L, lambda t: dinvs[t], T, block_m, S, batch, K.dtype
    )
    return L, X


def tri_inv(L: jax.Array, block: int = _TRI_INV_BLOCK) -> jax.Array:
    """Explicit inverse of a batched lower-triangular matrix.

    TPU-first rationale: XLA's TriangularSolve on TPU is substitution-bound
    and dominates the ELBO step (measured ~4 ms per solve group at
    sum(M)=300 vs ~0.03 ms for the same FLOPs as matmul).  Computing L^{-1}
    once turns every downstream whitening/solve into an MXU matmul.  The
    blocked construction does true (batched) triangular solves only on
    128x128 diagonal blocks and builds the off-diagonal blocks with
    matmuls:

        X[i,i] = inv(L[i,i]);   X[i,:i] = -X[i,i] @ L[i,:i] @ X[:i,:i]

    L must be well-conditioned (it comes from a jittered Cholesky here);
    the accuracy loss vs substitution is within f32 tolerance for the
    kernel matrices this framework produces (see tests).
    """
    S = L.shape[-1]
    batch = L.shape[:-2]
    if S <= block:
        return _tri_inv_newton(L)

    nb = -(-S // block)
    Sp = nb * block
    if Sp != S:
        L = pad_identity_tail(L, Sp)

    # batched matmul-only inversion of the nb diagonal blocks; stacking on
    # a NEW LEADING axis keeps the (8,128)-tiled layout of the trailing
    # dims (axis=-3 stacking forced a relayout copy of the whole stack)
    diag_blocks = jnp.stack(
        [L[..., i * block : (i + 1) * block, i * block : (i + 1) * block]
         for i in range(nb)],
        axis=0,
    )  # (nb, ..., B, B)
    dinv = _tri_inv_newton(diag_blocks)

    # shared contribution-accumulation row assembly (see _tri_inv_rows)
    X = _tri_inv_rows(L, lambda i: dinv[i], nb, block, Sp, batch, L.dtype)
    return X[..., :S, :S]


def tri_half_split(k: int) -> int | None:
    """Nearest lane-aligned (multiple-of-128) halfway split for
    block-triangular matmul skipping, or None when k < 512 — below that
    the saved FLOPs don't cover the extra dispatches.  Shared by the
    mvn_kl trace, the whitened marginal, and the factorization backward
    (ops.dispatch); production parity protocols all run k <= 300, so
    gating on k keeps their compiled programs bit-identical."""
    if k < 512:
        return None
    h = max(128, round(k / 256) * 128)
    return h if k - h >= 128 else None


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def tri3_blocks(A: jax.Array, h: int):
    """2x2 lower-block-triangular split: (..., k, k) -> (A11, A21, A22).

    Forward: three static slices (cheap strided reads).  Backward: the AD
    transpose of those slices is three full (k, k) pads summed pairwise —
    at k=1024 that is 3 x 126 MB of HBM writes per matrix per step
    (movement audit, scripts/flops_audit.py).  The hand VJP assembles the
    cotangent [[g11, 0], [g21, g22]] with two concatenates — ONE (k, k)
    materialization.  Exact: every element is one cotangent value or the
    same +0.0 fill pad would write."""
    return A[..., :h, :h], A[..., h:, :h], A[..., h:, h:]


def _tri3_blocks_fwd(A, h):
    return tri3_blocks(A, h), None


def _tri3_blocks_bwd(h, _res, gs):
    # cotangent batch/dtype == the slices' == A's (slices don't broadcast)
    g11, g21, g22 = gs
    k = h + g21.shape[-2]
    zeros = jnp.zeros((*g11.shape[:-1], k - h), g11.dtype)
    top = jnp.concatenate([g11, zeros], axis=-1)
    bot = jnp.concatenate([g21, g22], axis=-1)
    return (jnp.concatenate([top, bot], axis=-2),)


tri3_blocks.defvjp(_tri3_blocks_fwd, _tri3_blocks_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def rows2_blocks(A: jax.Array, h: int):
    """Contiguous 2-way row split: (..., k, c) -> (A[:h], A[h:]) with a
    single-concatenate cotangent (vs two full pads summed)."""
    return A[..., :h, :], A[..., h:, :]


def _rows2_blocks_fwd(A, h):
    return rows2_blocks(A, h), None


def _rows2_blocks_bwd(h, _res, gs):
    g1, g2 = gs
    return (jnp.concatenate([g1, g2], axis=-2),)


rows2_blocks.defvjp(_rows2_blocks_fwd, _rows2_blocks_bwd)


# ---------------------------------------------------------------------------
# Mixed-precision matmuls: f32 forward, bf16x3 backward (see _BWD above)
# ---------------------------------------------------------------------------


def _sum_to_shape(x: jax.Array, shape) -> jax.Array:
    """Reverse broadcasting: sum ``x`` down to ``shape``."""
    extra = x.ndim - len(shape)
    if extra:
        x = jnp.sum(x, axis=tuple(range(extra)))
    axes = tuple(i for i, s in enumerate(shape) if s == 1 and x.shape[i] != 1)
    if axes:
        x = jnp.sum(x, axis=axes, keepdims=True)
    return x


def _ein(pattern, a, b, prec):
    return jnp.einsum(pattern, a, b, precision=prec)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _dot_fb(kind: str, a: jax.Array, b: jax.Array) -> jax.Array:
    """kind: 'nn' = a @ b;  'tn' = a^T @ b;  'nt' = a @ b^T (trailing dims,
    broadcasting batch).  Forward at HIGHEST, cotangents at _BWD."""
    pat = {"nn": "...ij,...jk->...ik", "tn": "...ji,...jk->...ik",
           "nt": "...ij,...kj->...ik"}[kind]
    return _ein(pat, a, b, _HIGHEST)


def _dot_fb_fwd(kind, a, b):
    return _dot_fb(kind, a, b), (a, b)


def _dot_fb_bwd(kind, res, g):
    a, b = res
    if kind == "nn":  # out = a b: ga = g b^T, gb = a^T g
        ga = _ein("...ik,...jk->...ij", g, b, _BWD)
        gb = _ein("...ji,...jk->...ik", a, g, _BWD)
    elif kind == "tn":  # out = a^T b: ga = b g^T (j,i), gb = a g
        ga = _ein("...jk,...ik->...ji", b, g, _BWD)
        gb = _ein("...ji,...ik->...jk", a, g, _BWD)
    else:  # 'nt': out = a b^T: ga = g b, gb = g^T a
        ga = _ein("...ik,...kj->...ij", g, b, _BWD)
        gb = _ein("...ik,...ij->...kj", g, a, _BWD)
    return _sum_to_shape(ga, a.shape), _sum_to_shape(gb, b.shape)


_dot_fb.defvjp(_dot_fb_fwd, _dot_fb_bwd)


def mm(a: jax.Array, b: jax.Array) -> jax.Array:
    """a @ b — f32 forward, bf16x3 backward."""
    return _dot_fb("nn", a, b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _dot_hh(kind: str, a: jax.Array, b: jax.Array) -> jax.Array:
    """Like _dot_fb but bf16x3 in BOTH directions — for outputs consumed
    only by Monte-Carlo-sampled quantities (predictive marginals), where
    bf16x3 forward error (~1e-5 relative) sits far below the n_f/n_v
    sampling noise."""
    pat = {"nn": "...ij,...jk->...ik", "tn": "...ji,...jk->...ik",
           "nt": "...ij,...kj->...ik"}[kind]
    high = jax.lax.Precision.HIGH
    return jnp.einsum(pat, a, b, precision=high)


_dot_hh.defvjp(lambda kind, a, b: (_dot_hh(kind, a, b), (a, b)), _dot_fb_bwd)


def mm_h(a: jax.Array, b: jax.Array) -> jax.Array:
    """a @ b — bf16x3 forward AND backward (MC-noise-dominated outputs)."""
    return _dot_hh("nn", a, b)


def mtm_h(a: jax.Array, b: jax.Array) -> jax.Array:
    """a^T @ b — bf16x3 forward and backward."""
    return _dot_hh("tn", a, b)


def mtm(a: jax.Array, b: jax.Array) -> jax.Array:
    """a^T @ b — f32 forward, bf16x3 backward."""
    return _dot_fb("tn", a, b)


def mmt(a: jax.Array, b: jax.Array) -> jax.Array:
    """a @ b^T — f32 forward, bf16x3 backward."""
    return _dot_fb("nt", a, b)
