"""Backend dispatch between XLA reference ops and Pallas TPU kernels.

The XLA implementations are the correctness reference; Pallas versions must
match them within tolerance (tests/test_pallas.py).  Dispatch is resolved at
trace time (backend is a host-side global), so the chosen implementation is
baked into each jitted program.
"""

import functools
import os

import jax
import jax.numpy as jnp

_HIGHEST = jax.lax.Precision.HIGHEST

_BACKEND = os.environ.get("VARGP_TPU_BACKEND", "auto")


def set_backend(name: str) -> None:
    global _BACKEND
    if name not in ("xla", "pallas", "auto"):
        raise ValueError(f"unknown backend {name!r}")
    _BACKEND = name


def get_backend() -> str:
    if _BACKEND != "auto":
        return _BACKEND
    try:
        platform = jax.default_backend()
    except RuntimeError:
        return "xla"
    # Whitelist TPU-like platforms (native TPU + known tunneled TPU
    # plugins) for the Pallas/Mosaic path; every other platform — CPU,
    # GPU, and unknown plugins like METAL where Mosaic lowering would
    # fail — takes the XLA reference implementations.
    return "pallas" if platform in ("tpu", "axon", "proxy") else "xla"


# ---------------------------------------------------------------------------
# XLA reference implementations
# ---------------------------------------------------------------------------


def _sq_dist_xla(sx: jax.Array, sy: jax.Array, precision=_HIGHEST) -> jax.Array:
    """Pairwise squared distances ||sx_i - sy_j||^2.

    sx: ... x M x D, sy: ... x N x D -> ... x M x N.  The cross term is the
    MXU matmul; the norms fuse into the surrounding elementwise ops.
    """
    xx = jnp.sum(jnp.square(sx), axis=-1)
    yy = jnp.sum(jnp.square(sy), axis=-1)
    xy = jnp.einsum("...md,...nd->...mn", sx, sy, precision=precision)
    d2 = xx[..., :, None] - 2.0 * xy + yy[..., None, :]
    return jnp.maximum(d2, 0.0)


def _rbf_gram_xla(sx, sy, gamma2, precision=_HIGHEST):
    """gamma2 * exp(-0.5 ||sx_i - sy_j||^2); gamma2 broadcastable."""
    return gamma2 * jnp.exp(-0.5 * _sq_dist_xla(sx, sy, precision))


def resolve_precision(precision: str) -> jax.lax.Precision:
    """Map the public precision string to a lax.Precision, loudly: a typo
    silently degrading a factorized Gram to bf16x3 can defeat the PSD
    jitter and surface as intermittent Cholesky NaNs far downstream."""
    if precision == "highest":
        return jax.lax.Precision.HIGHEST
    if precision == "high":
        return jax.lax.Precision.HIGH
    raise ValueError(f"precision={precision!r}: expected 'highest' or 'high'")


def _env_choice(name: str, valid: tuple, default: str) -> str:
    """Read an env knob with the repo's loud-fail contract: an unknown
    value must raise, never silently select a different compiled program
    (same contract as VARGP_TPU_BWD_MATMUL / VARGP_TPU_AR_FORM)."""
    v = os.environ.get(name, default)
    if v not in valid:
        raise ValueError(f"{name}={v!r}: expected one of {valid}")
    return v


# ---------------------------------------------------------------------------
# Public dispatchers
# ---------------------------------------------------------------------------


def sq_dist(sx: jax.Array, sy: jax.Array) -> jax.Array:
    return _sq_dist_xla(sx, sy)


def rbf_gram(sx: jax.Array, sy: jax.Array, gamma2: jax.Array,
             precision: str = "highest") -> jax.Array:
    """Fused RBF Gram matrix on pre-scaled inputs.

    sx: ... x M x D;  sy: ... x N x D;  gamma2: broadcastable to ... x M x N.
    precision: "highest" (f32, required for factorized Grams — bf16-family
    error can defeat the PSD jitter) or "high" (bf16x3, ~2x faster, fine
    for cross-Grams that are never factorized).
    """
    prec = resolve_precision(precision)
    # Mosaic only lowers DEFAULT/HIGHEST dot precisions; HIGH (bf16x3) Grams
    # go through XLA, whose fusion of the scale+dot+exp chain is fine.
    # Partition-enabled (multi-device) traces also route through
    # rbf_gram_pallas so its custom_partitioning wrapper keeps sharded
    # batch axes local — see ops/partition.py.
    from vargp_tpu.ops.partition import partition_enabled

    # The Pallas fast path assumes gamma2 is CONSTANT within each Gram
    # block (a per-batch scalar shaped ... x 1 x 1 — every production call
    # site); a genuinely per-row/per-column gamma2 takes the XLA chain
    # below, which honors the full broadcast contract.
    gamma2_scalar = gamma2.ndim >= 2 and gamma2.shape[-2:] == (1, 1)
    if (
        precision == "highest"
        and gamma2_scalar
        and (get_backend() == "pallas" or partition_enabled())
    ):
        try:
            from vargp_tpu.ops.pallas.rbf_gram import rbf_gram_pallas

            return rbf_gram_pallas(sx, sy, gamma2, prec)
        except ImportError:
            pass
    return _rbf_gram_xla(sx, sy, gamma2, prec)


def sym_gram(z: jax.Array, invs: jax.Array, gamma2: jax.Array,
             precision: str = "highest") -> jax.Array:
    """Symmetric ARD Gram on RAW inputs — scaling fused into the kernel.

    z: (O, M, D) class-stacked rows; invs = exp(-log_ls): (H, D);
    gamma2: (H,).  Returns (H, O, M, M).  On the Pallas backend this
    avoids the (H, O, M, D) pre-scaled broadcast the generic ``rbf_gram``
    path materializes (and its 128-row padding); elsewhere it lowers to
    the same einsum chain XLA already fuses."""
    prec = resolve_precision(precision)
    from vargp_tpu.ops.partition import partition_enabled

    # Also route through sym_gram_pallas when kernel partitioning is on:
    # its primal then goes through the custom_partitioning wrapper (with
    # the XLA math on non-TPU backends), keeping the class axis sharded
    # on a mesh — see ops/partition.py.
    if precision == "highest" and (get_backend() == "pallas" or partition_enabled()):
        try:
            from vargp_tpu.ops.pallas.rbf_gram import sym_gram_pallas

            return sym_gram_pallas(z, invs, gamma2, prec)
        except ImportError:
            pass
    sz = z[None] * invs[:, None, None, :]  # (H, O, M, D)
    return rbf_gram(sz, sz, gamma2[:, None, None, None], precision=precision)


def chol_and_inv(K: jax.Array, block_m: int | None = None):
    """(chol(K), chol(K)^{-1}); thin reordering wrapper — custom_vjp wants
    its nondiff (static) argument first."""
    return _chol_and_inv_p(block_m, K)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _chol_and_inv_p(block_m: int | None, K: jax.Array):
    """(chol(K), chol(K)^{-1}) — the model hot path's only factorization.

    Forward: XLA batched Cholesky + Newton-Schulz blocked triangular
    inverse (pure matmuls — see gpmath.linalg._tri_inv_newton).  A fused
    Pallas kernel exists (ops.pallas.chol_inv) but its column-sequential
    masked loops measure ~8.7 ms vs ~1 ms for this path on v5e; opt in via
    VARGP_TPU_CHOLINV=pallas.

    Backward: hand-derived all-matmul rule using the saved (L, L^{-1}) —
    the default cholesky VJP would reintroduce triangular-solve
    custom-calls on the TPU critical path.

    ``block_m``: known natural block size (per-task inducing count) —
    routes to the task-blocked factorization (T small batched Cholesky
    calls + MXU matmuls) which beats the monolithic custom-call's
    per-panel latency.
    """
    return _chol_and_inv_impl(K, block_m)


# Shape-driven blocked-split rule.  Blocks of ~96-160 with <=8 blocks beat
# the monolithic custom-call: XLA's internal 64-panel trailing updates lose
# to fewer, smaller custom-calls glued with our MXU matmuls.  Measured
# (incl. inverse, v5e, batch 30): S=300 1.73 vs 1.88 ms; S=500 2.43 vs
# 3.13; S=800 5.71 vs 7.78; S=1000 10.3 vs 10.2 (wash — sequential call
# latency catches up as the block count grows, hence the cap).
_BLOCK_LO, _BLOCK_HI = 96, 160
_MAX_BLOCKS = 8
_PAD_WASTE_LIMIT = 0.15  # identity-pad fallback only if <=15% extra rows


def _pick_block(S: int) -> int | None:
    """Largest-batch-friendly divisor block: any divisor of S in
    [_BLOCK_LO, hi] with 2.._MAX_BLOCKS blocks, preferring sizes near
    ~118 (the microbenchmark sweet spot between per-call latency and MXU
    tile alignment).  On the Pallas backend the diagonal-block kernel
    (gpmath.linalg._diag_chol) only takes blocks <= 128, so the upper
    bound tightens — blocks above 128 would silently fall back to the
    8.7x-slower XLA custom-call per diagonal block."""
    hi = 128 if get_backend() == "pallas" else _BLOCK_HI
    best = None
    for T in range(2, _MAX_BLOCKS + 1):
        if S % T:
            continue
        d = S // T
        if _BLOCK_LO <= d <= hi:
            score = abs(d - 118)
            if best is None or score < best[1]:
                best = (d, score)
    return best[0] if best else None


def _chol_and_inv_impl(K, block_m=None):
    if _env_choice("VARGP_TPU_CHOLINV", ("xla", "pallas"), "xla") == "pallas":
        try:
            from vargp_tpu.ops.pallas.chol_inv import _chol_inv_call

            return _chol_inv_call(K)
        except ImportError:
            pass
    from vargp_tpu.gpmath.linalg import _diag_chol, chol_and_inv_blocked, tri_inv

    if block_m is not None and K.shape[-1] % block_m == 0:
        return chol_and_inv_blocked(K, block_m)
    S = K.shape[-1]
    if S > _BLOCK_HI:
        d = _pick_block(S)
        if d is not None:
            return chol_and_inv_blocked(K, d)
        # No friendly divisor: identity-pad to the next multiple of 128
        # when the waste is small (gpmath.linalg.pad_identity_tail —
        # slicing the leading S x S blocks back out is EXACT, tested).
        Sp = -(-S // 128) * 128
        if Sp // 128 <= _MAX_BLOCKS and (Sp - S) / S <= _PAD_WASTE_LIMIT:
            from vargp_tpu.gpmath.linalg import pad_identity_tail

            Lp, Xp = chol_and_inv_blocked(pad_identity_tail(K, Sp), 128)
            return Lp[..., :S, :S], Xp[..., :S, :S]
    L = _diag_chol(K) if S <= 128 else jnp.linalg.cholesky(K)
    return L, tri_inv(L)


def _chol_and_inv_fwd(block_m, K):
    L, Linv = _chol_and_inv_impl(K, block_m)
    return (L, Linv), (L, Linv)


def _tri_bwd_split(S: int) -> int | None:
    """Lane-aligned 2-block split for the triangular-skip backward, or
    None when the matrix is too small for the skipping to pay."""
    # Default ON since the hardware A/B (TPU v5e 2026-08-18): M=1024
    # step 42.4 -> 38.5 ms, S=1000 51.0 -> 49.3 ms, losses identical
    # (forward unchanged; backward differs only by blocked accumulation
    # order).  tri_half_split's k >= 512 gate keeps every production
    # parity protocol (k <= 300) on the bit-identical dense rule.
    # VARGP_TPU_TRI_BWD=0 reverts to the dense backward everywhere.
    if _env_choice("VARGP_TPU_TRI_BWD", ("0", "1"), "1") == "0":
        return None
    from vargp_tpu.gpmath.linalg import tri_half_split

    return tri_half_split(S)


def _chol_bwd_blocked(L, Linv, GL, Ginv, h):
    """Triangular-skip variant of the dense rule below (default for
    S >= 512 since the 2026-08-18 hardware A/B; VARGP_TPU_TRI_BWD=0
    reverts to the dense rule).

    All four operands are (effectively) lower-triangular: a structural
    index argument shows each product only ever reads the lower parts —
    tril(U G U) reads G_jk only at j >= k, tril(L^T B) reads B_kj only at
    k >= j — so a 2x2 block split can skip the strictly-upper blocks and
    one mirror of the symmetric K̄, dropping the five dense (S, S)^2 dots
    (40 half-size dot units) to 22: ~45% of the backward's matmul FLOPs
    (322 GFLOP at the M=1024 bench shape, scripts/flops_audit.py).
    Results differ from the dense rule only by blocked accumulation
    order (tested).
    """
    from vargp_tpu.gpmath.linalg import _BWD

    TN = "...ji,...jk->...ik"  # a^T @ b
    NT = "...ij,...kj->...ik"  # a @ b^T
    NN = "...ij,...jk->...ik"
    e = lambda pat, a, b: jnp.einsum(pat, a, b, precision=_BWD)
    S = L.shape[-1]
    a1, a2, a3 = Linv[..., :h, :h], Linv[..., h:, :h], Linv[..., h:, h:]
    g1, g2, g3 = Ginv[..., :h, :h], Ginv[..., h:, :h], Ginv[..., h:, h:]

    # extra = -(Linv^T Ginv Linv^T); only its lower blocks survive *tril
    P11 = e(NT, g1, a1)
    P21 = e(NT, g2, a1)
    P22 = e(NT, g2, a2) + e(NT, g3, a3)
    E11 = e(TN, a1, P11) + e(TN, a2, P21)
    E21 = e(TN, a3, P21)
    E22 = e(TN, a3, P22)
    z12 = jnp.zeros((*E11.shape[:-1], S - h), L.dtype)
    extra = -jnp.concatenate(
        [
            jnp.concatenate([E11, z12], axis=-1),
            jnp.concatenate([E21, E22], axis=-1),
        ],
        axis=-2,
    )
    tril = jnp.tril(jnp.ones((S, S), L.dtype))
    B = GL + extra * tril

    # Phi needs only tril(L^T B) (k >= i >= j index argument)
    l1, l2, l3 = L[..., :h, :h], L[..., h:, :h], L[..., h:, h:]
    b1, b2, b3 = B[..., :h, :h], B[..., h:, :h], B[..., h:, h:]
    S11 = e(TN, l1, b1) + e(TN, l2, b2)
    S21 = e(TN, l3, b2)
    S22 = e(TN, l3, b3)
    z12s = jnp.zeros((*S11.shape[:-1], S - h), L.dtype)
    Smat = jnp.concatenate(
        [
            jnp.concatenate([S11, z12s], axis=-1),
            jnp.concatenate([S21, S22], axis=-1),
        ],
        axis=-2,
    )
    Phi = Smat * tril - 0.5 * jnp.eye(S, dtype=L.dtype) * Smat
    sym = Phi + jnp.swapaxes(Phi, -1, -2)

    # K̄ = 0.5 Linv^T sym Linv is symmetric: compute K12 as K21^T
    y1, y21, y3 = sym[..., :h, :h], sym[..., h:, :h], sym[..., h:, h:]
    Q11 = e(NN, y1, a1) + e(TN, y21, a2)
    Q21 = e(NN, y21, a1) + e(NN, y3, a2)
    Q22 = e(NN, y3, a3)
    K11 = e(TN, a1, Q11) + e(TN, a2, Q21)
    K21 = e(TN, a3, Q21)
    K22 = e(TN, a3, Q22)
    Kbar = 0.5 * jnp.concatenate(
        [
            jnp.concatenate([K11, jnp.swapaxes(K21, -1, -2)], axis=-1),
            jnp.concatenate([K21, K22], axis=-1),
        ],
        axis=-2,
    )
    return (Kbar,)


def _chol_and_inv_bwd(block_m, res, cots):
    from vargp_tpu.gpmath.linalg import _BWD

    L, Linv = res
    GL, Ginv = cots
    h = _tri_bwd_split(L.shape[-1])
    if h is not None:
        return _chol_bwd_blocked(L, Linv, GL, Ginv, h)
    tril = jnp.tril(jnp.ones(L.shape[-2:], L.dtype))

    # d(L^{-1}) = -L^{-1} dL L^{-1}  =>  L_bar += -(L^{-T} Ginv L^{-T}) . tril
    # cotangent math runs at _BWD (bf16x3 by default — far below the
    # ELBO gradient's MC noise floor; see linalg._BWD)
    extra = -jnp.einsum(
        "...ji,...jk,...lk->...il", Linv, Ginv, Linv, precision=_BWD
    )
    GL = GL + extra * tril

    # Cholesky reverse rule (Murray 2016) with solves as Linv matmuls:
    #   Phi = tril(L^T GL) with halved diagonal
    #   K_bar = 0.5 * L^{-T} (Phi + Phi^T) L^{-1}
    S = jnp.einsum("...ji,...jk->...ik", L, GL, precision=_BWD)
    Phi = S * tril - 0.5 * jnp.eye(L.shape[-1], dtype=L.dtype) * S
    sym = Phi + jnp.swapaxes(Phi, -1, -2)
    Kbar = 0.5 * jnp.einsum(
        "...ji,...jk,...kl->...il", Linv, sym, Linv, precision=_BWD
    )
    return (Kbar,)


_chol_and_inv_p.defvjp(_chol_and_inv_fwd, _chol_and_inv_bwd)


def batched_cholesky(K: jax.Array) -> jax.Array:
    """Batched lower Cholesky.

    Measured on TPU v5e (30 matrices of 300^2): XLA 0.027 ms vs the Pallas
    one-matrix-per-program kernel 0.049 ms — XLA's batched potrf is already
    excellent in this regime, so it is the default ('auto' == 'xla', the
    measured winner, matching what 'auto' means on every other knob); set
    VARGP_TPU_CHOLESKY=pallas to force the Pallas kernel."""
    if _env_choice("VARGP_TPU_CHOLESKY", ("auto", "xla", "pallas"), "auto") == "pallas":
        try:
            from vargp_tpu.ops.pallas.chol import cholesky_pallas

            return cholesky_pallas(K)
        except ImportError:
            pass
    return jnp.linalg.cholesky(K)
