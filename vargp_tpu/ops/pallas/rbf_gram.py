"""Pallas TPU kernel: fused RBF Gram matrix.

Computes K[g, i, j] = gamma2[g] * exp(-0.5 * ||sx[g,i] - sy[g,j]||^2) in one
pass: the cross-term matmul runs on the MXU, row norms and the exp fuse on
the VPU, and the (M, N) Gram block never round-trips to HBM between the
distance computation and the exponential (the XLA fallback relies on fusion
heuristics; this makes it explicit and tiles for the 128x128 MXU).

Replaces the reference's einsum+exp chain (var_gp/kernels.py:44-56).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 128
TILE_N = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_gram_kernel(precision):
    def _gram_kernel(sx_ref, sy_ref, g2_ref, out_ref):
        """One (TILE_M, TILE_N) block of one batch element's Gram matrix."""
        sx = sx_ref[0]  # (TILE_M, D)
        sy = sy_ref[0]  # (TILE_N, D)
        xx = jnp.sum(jnp.square(sx), axis=-1)[:, None]  # (TILE_M, 1)
        yy = jnp.sum(jnp.square(sy), axis=-1)[None, :]  # (1, TILE_N)
        xy = jax.lax.dot_general(
            sx,
            sy,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        d2 = jnp.maximum(xx - 2.0 * xy + yy, 0.0)
        out_ref[0] = g2_ref[pl.program_id(0), 0] * jnp.exp(-0.5 * d2)
    return _gram_kernel


@functools.partial(jax.jit, static_argnames=("precision",))
def _gram_3d(sx: jax.Array, sy: jax.Array, gamma2: jax.Array,
             precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """sx: (G, M, D), sy: (G, N, D), gamma2: (G,) -> (G, M, N)."""
    G, M, D = sx.shape
    N = sy.shape[1]
    Mp, Np = _round_up(M, TILE_M), _round_up(N, TILE_N)
    Dp = _round_up(D, 128)  # lane-aligned contraction dim
    # zero padding is exact: zero features change neither norms nor dots;
    # padded rows/cols produce garbage only where we slice off
    sx_p = jnp.pad(sx, ((0, 0), (0, Mp - M), (0, Dp - D)))
    sy_p = jnp.pad(sy, ((0, 0), (0, Np - N), (0, Dp - D)))
    D = Dp

    grid = (G, Mp // TILE_M, Np // TILE_N)
    out = pl.pallas_call(
        _make_gram_kernel(precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, TILE_M, D), lambda g, i, j: (g, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, TILE_N, D), lambda g, i, j: (g, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # whole (G, 1) scalar table
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_M, TILE_N), lambda g, i, j: (g, i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((G, Mp, Np), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * G * Mp * Np * D,
            bytes_accessed=4 * G * (Mp * D + Np * D + Mp * Np),
            transcendentals=G * Mp * Np,
        ),
    )(sx_p, sy_p, gamma2.reshape(G, 1))
    return out[:, :M, :N]


def _rbf_gram_impl(sx: jax.Array, sy: jax.Array, g2: jax.Array,
                   precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Backend-dispatching Gram body on batch-normalized operands.

    sx: (B..., M, D); sy: (B..., N, D); g2: (B...,) — batch dims already
    broadcast to a common shape.  Mosaic kernel on TPU-like backends
    (flatten batch -> grid), the equivalent XLA math elsewhere so
    ops.partition's CPU-mesh tests exercise the partitioning rule that
    wraps this function."""
    from vargp_tpu.ops.dispatch import get_backend

    batch = sx.shape[:-2]
    M, D = sx.shape[-2:]
    N = sy.shape[-2]
    if get_backend() == "pallas":
        out = _gram_3d(
            sx.reshape(-1, M, D),
            sy.reshape(-1, N, D),
            g2.reshape(-1).astype(jnp.float32),
            precision=precision,
        )
        return out.reshape(*batch, M, N)
    xx = jnp.sum(jnp.square(sx), axis=-1)
    yy = jnp.sum(jnp.square(sy), axis=-1)
    xy = jnp.einsum("...md,...nd->...mn", sx, sy, precision=precision)
    d2 = jnp.maximum(xx[..., :, None] - 2.0 * xy + yy[..., None, :], 0.0)
    return g2[..., None, None] * jnp.exp(-0.5 * d2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def rbf_gram_pallas(sx: jax.Array, sy: jax.Array, gamma2: jax.Array,
                    precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Dispatch-compatible entry: arbitrary leading batch dims.

    sx: ... x M x D;  sy: ... x N x D;  gamma2 broadcastable to ... x M x N
    (in practice a per-(hyper) scalar broadcast over classes/rows/cols).

    Custom VJP: the Pallas forward is opaque to AD; the backward is pure
    matmul/reduction math that XLA fuses well on its own:
      dK/dsx_i . g = (W sy)_i - rowsum(W)_i sx_i  with W = g * K
      dK/dgamma2   = sum(g * K) / gamma2
    """
    batch = jnp.broadcast_shapes(sx.shape[:-2], sy.shape[:-2], gamma2.shape[:-2])
    M, D = sx.shape[-2:]
    N = sy.shape[-2]

    sx_b = jnp.broadcast_to(sx, (*batch, M, D))
    sy_b = jnp.broadcast_to(sy, (*batch, N, D))
    # gamma2 is constant within a Gram block in all call sites
    g2_b = jnp.broadcast_to(gamma2[..., :1, :1], (*batch, 1, 1)).reshape(batch)

    from vargp_tpu.ops.partition import partition_enabled, rbf_gram_partitioned

    if partition_enabled() and batch:
        # multi-device: the batch flatten above would force an all-gather
        # of any sharded (class) batch axis; the partitioned wrapper
        # flattens shard-locally instead (ops.partition)
        return rbf_gram_partitioned(sx_b, sy_b, g2_b, precision)
    return _rbf_gram_impl(sx_b, sy_b, g2_b, precision)


def _rbf_gram_fwd(sx, sy, gamma2, precision=jax.lax.Precision.HIGHEST):
    K = rbf_gram_pallas(sx, sy, gamma2, precision)
    return K, (sx, sy, gamma2, K)


def _rbf_gram_bwd(precision, res, g):
    from vargp_tpu.gpmath.linalg import _BWD, _sum_to_shape

    sx, sy, gamma2, K = res
    W = g * K  # ... x M x N
    row = jnp.sum(W, axis=-1)  # ... x M
    col = jnp.sum(W, axis=-2)  # ... x N
    P = _BWD  # cotangents tolerate bf16x3 (see linalg._BWD)
    dsx = jnp.einsum("...mn,...nd->...md", W, sy, precision=P) - row[..., None] * sx
    dsy = jnp.einsum("...mn,...md->...nd", W, sx, precision=P) - col[..., None] * sy
    # dK/dgamma2 = K / gamma2 elementwise
    dg2 = jnp.sum(g * (K / jnp.maximum(gamma2, 1e-30)), axis=(-2, -1), keepdims=True)
    return (
        _sum_to_shape(dsx, sx.shape),
        _sum_to_shape(dsy, sy.shape),
        _sum_to_shape(dg2, gamma2.shape),
    )


rbf_gram_pallas.defvjp(_rbf_gram_fwd, _rbf_gram_bwd)


# ---------------------------------------------------------------------------
# Fused-scaling symmetric ARD Gram (the factorized Kzz path)
# ---------------------------------------------------------------------------
#
# K[h, o, i, j] = gamma2[h] * exp(-0.5 * sum_d invs[h,d]^2 (z[o,i,d]-z[o,j,d])^2)
#
# The generic path (kernels.rbf.gram -> rbf_gram_pallas) pre-scales inputs
# per hyper-sample OUTSIDE the kernel: at flagship shapes that broadcasts
# z (O, SM, D) to an (H, O, SM, D) HBM array twice (forward + held for
# backward) and pads SM=300 rows up to 384.  This primitive feeds the
# kernel raw z + per-hyper inverse lengthscales and scales in VMEM:
#   * no (H, O, SM, D) materialization anywhere (fwd or bwd);
#   * the hyper axis is a pure grid dimension — z tiles are re-read per h
#     from the SAME small array instead of from H broadcast copies;
#   * row tiles drop to 64 when that reduces padding (300 -> 320 rows
#     instead of 384; lanes stay 128 wide).
# The hand VJP mirrors kernels.rbf._cross_gram_p_bwd: two big MXU
# contractions (P, Q) shared between the z and lengthscale cotangents.
#
# Replaces the reference Kzz chain (var_gp/kernels.py:44-54 with x = y)
# for the non-DKL model; kernels.rbf.gram remains the oracle (tested).


def _make_sym_gram_whole_kernel(precision, R):
    def _kernel(z_ref, inv_ref, g2_ref, out_ref):
        inv = inv_ref[0, 0]  # (D,)
        sz = z_ref[0] * inv  # (C, D) — cols; rows are its leading R slice
        sx = sz[:R]  # (R, D) static slice, no extra load
        xx = jnp.sum(jnp.square(sx), axis=-1)[:, None]
        yy = jnp.sum(jnp.square(sz), axis=-1)[None, :]
        xy = jax.lax.dot_general(
            sx,
            sz,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        d2 = jnp.maximum(xx - 2.0 * xy + yy, 0.0)
        out_ref[0, 0] = g2_ref[pl.program_id(0), 0] * jnp.exp(-0.5 * d2)

    return _kernel


def _make_sym_gram_tri_kernel(precision, R, n_panels):
    """Triangle-skip variant: compute only the lower-triangular 128-row
    panels of the symmetric Gram and MIRROR the finished off-diagonal
    tiles in VMEM (transpose-copy), skipping ~42% of the MXU FLOPs the
    whole-block kernel spends on the (known) upper triangle.  Panel i
    dots rows [128i, 128(i+1)) against columns [0, 128(i+1)) only.
    """
    def _kernel(z_ref, inv_ref, g2_ref, out_ref):
        inv = inv_ref[0, 0]  # (D,)
        sz = z_ref[0] * inv  # (C, D)
        # Keep the squared-norm vector 2-D before slicing: a 1-D
        # slice-plus-newaxis (yy[r0:r1, None]) lowers to a gather, which
        # Mosaic rejects ("Only 2D gather is supported"); plain 2-D
        # slices lower to static slice ops.
        yy = jnp.sum(jnp.square(sz), axis=-1)  # (C,)
        yy_col = yy[:, None]  # (C, 1): newaxis on the FULL array is fine
        yy_row = yy[None, :]  # (1, C)
        g2 = g2_ref[pl.program_id(0), 0]
        for i in range(n_panels):
            r0, r1 = 128 * i, min(128 * (i + 1), R)
            c1 = 128 * (i + 1)
            sx = sz[r0:r1]  # (Pi, D) static slice
            xy = jax.lax.dot_general(
                sx,
                sz[:c1],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            d2 = jnp.maximum(yy_col[r0:r1] - 2.0 * xy + yy_row[:, :c1], 0.0)
            k = g2 * jnp.exp(-0.5 * d2)  # (Pi, c1)
            out_ref[0, 0, r0:r1, :c1] = k
            for j in range(i):  # mirror finished off-diagonal tiles
                out_ref[0, 0, 128 * j:128 * (j + 1), r0:r1] = (
                    k[:, 128 * j:128 * (j + 1)].T
                )

    return _kernel


@functools.partial(jax.jit, static_argnames=("precision", "interpret"))
def _sym_gram_4d_tri(z: jax.Array, invs: jax.Array, gamma2: jax.Array,
                     precision=jax.lax.Precision.HIGHEST,
                     interpret=False) -> jax.Array:
    """Triangle-skip whole-block symmetric Gram; same contract as
    ``_sym_gram_4d``.  DEFAULT for M >= 512 since the 2026-08-18 hardware
    A/B (1.3-1.6x fwd+bwd at M >= 1000; mixed-to-losing at M <= 300, so
    shape-gated — see _sym_gram_impl).  VARGP_TPU_SYMGRAM=tri/whole
    overrides the gate either way."""
    O, M, D = z.shape
    H = invs.shape[0]
    R = _round_up(M, 8)
    C = _round_up(M, TILE_N)
    Dp = _round_up(D, 128)
    z_p = jnp.pad(z, ((0, 0), (0, C - M), (0, Dp - D)))
    invs_p = jnp.pad(invs, ((0, 0), (0, Dp - D)))
    n_panels = C // 128

    out = pl.pallas_call(
        _make_sym_gram_tri_kernel(precision, R, n_panels),
        grid=(H, O),
        in_specs=[
            pl.BlockSpec(
                (1, C, Dp), lambda h, o: (o, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, Dp), lambda h, o: (h, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, R, C), lambda h, o: (h, o, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((H, O, R, C), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=H * O * R * C * Dp,  # ~half the full-block dot
            bytes_accessed=4 * (H * O * C * Dp + H * O * R * C),
            transcendentals=H * O * R * C // 2,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(z_p, invs_p[:, None, :], gamma2.reshape(H, 1).astype(jnp.float32))
    return out[:, :, :M, :M]


@functools.partial(jax.jit, static_argnames=("precision",))
def _sym_gram_4d(z: jax.Array, invs: jax.Array, gamma2: jax.Array,
                 precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """z: (O, M, D), invs: (H, D), gamma2: (H,) -> (H, O, M, M).

    One grid program per (h, o): the whole (M, D) class block is DMA'd
    into VMEM ONCE and the full Gram computed with a single MXU
    contraction.  A (TILE_M, TILE_N)-tiled grid re-reads each z tile
    ~(M/TILE)x from HBM (at flagship shapes ~300 MB of traffic for 11 MB
    of data); whole-block loading makes the kernel purely FLOP-bound.
    Rows pad to 8 (sublane), cols to 128 (lane): M=300 runs as 304 x 384
    instead of 384 x 384.
    """
    O, M, D = z.shape
    H = invs.shape[0]
    R = _round_up(M, 8)  # rows: sublane-aligned
    C = _round_up(M, TILE_N)  # cols: lane-aligned
    Dp = _round_up(D, 128)
    z_p = jnp.pad(z, ((0, 0), (0, C - M), (0, Dp - D)))
    invs_p = jnp.pad(invs, ((0, 0), (0, Dp - D)))

    grid = (H, O)
    out = pl.pallas_call(
        _make_sym_gram_whole_kernel(precision, R),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, C, Dp), lambda h, o: (o, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, Dp), lambda h, o: (h, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # whole (H, 1) scalar table
        ],
        out_specs=pl.BlockSpec(
            (1, 1, R, C), lambda h, o: (h, o, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((H, O, R, C), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * H * O * R * C * Dp,
            bytes_accessed=4 * (H * O * C * Dp + H * O * R * C),
            transcendentals=H * O * R * C,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(z_p, invs_p[:, None, :], gamma2.reshape(H, 1).astype(jnp.float32))
    return out[:, :, :M, :M]


# ---------------------------------------------------------------------------
# Fused-scaling cross Gram (the predictive Kzx path)
# ---------------------------------------------------------------------------
#
# K[h, o, i, b] = gamma2[h] * exp(-0.5 * sum_d invs2[h,d] (z[o,i,d]-x[b,d])^2)
#
# The XLA formulation (kernels.rbf._cross_gram_fwd_math) contracts
# einsum("oid,hbd->hoib") whose dot_general emits (o,i,h,b) and pays an
# explicit relayout transpose to (h,o,i,b) — 123 MB/batch at analysis MC
# budgets (H=20, S=300, B=512; flops_audit_eval attribution).  This kernel
# writes the consumed layout directly: grid (H, O), the shared batch x is
# fetched into VMEM once (constant index map -> no per-program re-DMA),
# scaled by the per-hyper inverse-square lengthscales in VMEM, and the
# (M, B) block never round-trips between the distance and the exp.
# Scaling convention matches the XLA math exactly: x carries invs2, z is
# raw (zz/xx norms weighted by invs2).


def _dot_nt_bf16x3(a, b):
    """a @ b^T with bf16x3 emulation (the 3-product scheme XLA lowers
    Precision.HIGH to).  Mosaic rejects precision=HIGH on dot_general, so
    the splitting is explicit: hi = bf16(x), lo = bf16(x - hi); the lo*lo
    term (~2^-32 relative) is dropped exactly as XLA's HIGH does."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def dn(u, v):
        return jax.lax.dot_general(
            u,
            v,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return dn(a_hi, b_hi) + (dn(a_hi, b_lo) + dn(a_lo, b_hi))


def _make_cross_gram_kernel(precision):
    high = precision == jax.lax.Precision.HIGH

    def _kernel(z_ref, x_ref, inv2_ref, g2_ref, out_ref):
        inv2 = inv2_ref[0, 0]  # (D,)
        z = z_ref[0]  # (R, D) raw inducing rows
        x = x_ref[...]  # (B, D) shared data batch
        sx = x * inv2  # (B, D)
        zz = jnp.sum(z * (z * inv2), axis=-1)[:, None]  # (R, 1)
        xx = jnp.sum(x * sx, axis=-1)[None, :]  # (1, B)
        if high:
            xy = _dot_nt_bf16x3(z, sx)
        else:
            xy = jax.lax.dot_general(
                z,
                sx,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
        d2 = jnp.maximum(zz - 2.0 * xy + xx, 0.0)
        out_ref[0, 0] = g2_ref[pl.program_id(0), 0] * jnp.exp(-0.5 * d2)

    return _kernel


@functools.partial(jax.jit, static_argnames=("precision",))
def _cross_gram_4d(z: jax.Array, x: jax.Array, invs2: jax.Array,
                   gamma2: jax.Array,
                   precision=jax.lax.Precision.HIGH) -> jax.Array:
    """z: (O, M, D), x: (B, D), invs2: (H, D), gamma2: (H,)
    -> (H, O, M, B) in the natively consumed layout."""
    O, M, D = z.shape
    B = x.shape[0]
    H = invs2.shape[0]
    R = _round_up(M, 8)  # rows: sublane-aligned
    Bp = _round_up(B, TILE_N)  # cols: lane-aligned
    Dp = _round_up(D, 128)
    z_p = jnp.pad(z, ((0, 0), (0, R - M), (0, Dp - D)))
    x_p = jnp.pad(x, ((0, Bp - B), (0, Dp - D)))
    inv_p = jnp.pad(invs2, ((0, 0), (0, Dp - D)))

    out = pl.pallas_call(
        _make_cross_gram_kernel(precision),
        grid=(H, O),
        in_specs=[
            pl.BlockSpec(
                (1, R, Dp), lambda h, o: (o, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (Bp, Dp), lambda h, o: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, Dp), lambda h, o: (h, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (H, 1) scalar table
        ],
        out_specs=pl.BlockSpec(
            (1, 1, R, Bp), lambda h, o: (h, o, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((H, O, R, Bp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * H * O * R * Bp * Dp,
            bytes_accessed=4 * (H * O * R * Dp + Bp * Dp + H * O * R * Bp),
            transcendentals=H * O * R * Bp,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(z_p, x_p, inv_p[:, None, :], gamma2.reshape(H, 1).astype(jnp.float32))
    return out[:, :, :M, :B]


def _cross_gram_impl(z: jax.Array, x: jax.Array, invs2: jax.Array,
                     gamma2: jax.Array,
                     precision=jax.lax.Precision.HIGH) -> jax.Array:
    """Backend-dispatching cross-Gram body (no VJP, no partitioning).

    Mosaic kernel on TPU-like backends; the equivalent XLA math elsewhere
    so the CPU-mesh partitioning tests exercise the rule that wraps this."""
    from vargp_tpu.ops.dispatch import get_backend

    if get_backend() == "pallas":
        return _cross_gram_4d(z, x, invs2, gamma2, precision)
    xs = x[None] * invs2[:, None, :]  # (H, B, D)
    cross = jnp.einsum("oid,hbd->hoib", z, xs, precision=precision)
    zz = jnp.einsum("oid,hd->hoi", z * z, invs2, precision=precision)
    xx = jnp.einsum("bd,hd->hb", x * x, invs2, precision=precision)
    d2 = jnp.maximum(zz[..., None] + xx[:, None, None, :] - 2.0 * cross, 0.0)
    return gamma2[:, None, None, None] * jnp.exp(-0.5 * d2)


def _sym_gram_impl(z: jax.Array, invs: jax.Array, gamma2: jax.Array,
                   precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Backend-dispatching symmetric-Gram body (no VJP, no partitioning).

    Mosaic kernels on TPU-like backends; the equivalent XLA math
    elsewhere, which lets ops.partition's CPU-mesh tests (and the
    8-virtual-device dryrun) exercise the partitioning rule that wraps
    this function."""
    import os

    from vargp_tpu.ops.dispatch import get_backend

    if get_backend() == "pallas":
        # Triangle-skip kernel: hardware A/B (scripts/bench_symgram.py,
        # TPU v5e 2026-08-18) shows it 1.3-1.6x faster fwd+bwd at
        # M >= 1000 but mixed-to-losing at the flagship M=300 / M=128
        # shapes, so it is shape-gated.  VARGP_TPU_SYMGRAM=tri/whole
        # overrides the gate either way; unknown values raise (loud-fail
        # env contract — ops.dispatch._env_choice).
        from vargp_tpu.ops.dispatch import _env_choice

        mode = _env_choice("VARGP_TPU_SYMGRAM", ("auto", "tri", "whole"), "auto")
        # VMEM-fit gate: both whole-block kernels hold one (R, C) output
        # window plus the (C, Dp) class block per program, double-buffered.
        # At scaled chain sizes (S = T*M >= ~3.5k, e.g. M=1024 x 5 tasks)
        # that exceeds the 128 MB VMEM and Mosaic refuses the allocation —
        # fall back to the XLA einsum formulation, which tiles fine.
        # Forced tri/whole modes bypass the gate (loud-fail contract).
        if mode == "auto":
            M, D = z.shape[-2], z.shape[-1]
            R, C, Dp = _round_up(M, 8), _round_up(M, TILE_N), _round_up(D, 128)
            if 8 * (R * C + C * Dp) > 96 * 1024 * 1024:
                return _sym_gram_xla_math(z, invs, gamma2, precision)
        if mode == "tri" or (mode != "whole" and z.shape[-2] >= 512):
            return _sym_gram_4d_tri(z, invs, gamma2, precision)
        return _sym_gram_4d(z, invs, gamma2, precision)
    return _sym_gram_xla_math(z, invs, gamma2, precision)


def _sym_gram_xla_math(z, invs, gamma2, precision):
    """XLA formulation of the symmetric Gram — the non-TPU backend body
    and the VMEM-overflow fallback for scaled chain sizes."""
    sz = z[None] * invs[:, None, None, :]  # (H, O, M, D)
    nn = jnp.sum(jnp.square(sz), axis=-1)  # (H, O, M)
    xy = jnp.einsum("homd,hond->homn", sz, sz, precision=precision)
    d2 = jnp.maximum(nn[..., :, None] - 2.0 * xy + nn[..., None, :], 0.0)
    return gamma2[:, None, None, None] * jnp.exp(-0.5 * d2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def sym_gram_pallas(z: jax.Array, invs: jax.Array, gamma2: jax.Array,
                    precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Symmetric ARD Gram over class-stacked inducing rows.

    z: (O, M, D); invs = exp(-log_ls): (H, D); gamma2: (H,).
    Returns (H, O, M, M), numerically identical to
    ``kernels.rbf.gram(theta, z)`` (tested)."""
    from vargp_tpu.ops.partition import partition_enabled, sym_gram_partitioned

    if partition_enabled():
        # multi-device: GSPMD rule keeps the class/hyper axes sharded
        # instead of replicating the opaque kernel call (ops.partition)
        return sym_gram_partitioned(z, invs, gamma2, precision)
    return _sym_gram_impl(z, invs, gamma2, precision)


def _sym_gram_fwd(z, invs, gamma2, precision):
    K = sym_gram_pallas(z, invs, gamma2, precision)
    return K, (z, invs, gamma2, K)


def _sym_gram_bwd(precision, res, g):
    from vargp_tpu.gpmath.linalg import _BWD

    z, invs, gamma2, K = res
    W = g * K  # (H, O, M, M)
    # Work with the SYMMETRIZED d2-cotangent: because d2 (and K) is
    # symmetric in (i, j), every downstream quantity depends on gd2 only
    # through S = gd2 + gd2^T — one big MXU contraction (SZ) serves both
    # the z and lengthscale cotangents instead of two (P, Q).
    S = -0.5 * (W + jnp.swapaxes(W, -1, -2))
    invs2 = invs * invs  # (H, D)
    SZ = jnp.einsum("hoij,ojd->hoid", S, z, precision=_BWD)  # the big one
    R = jnp.sum(S, axis=-1)  # (H, O, M) row sums (= col sums of S)
    # dz: d d2/dz_oid = 2 invs2 sum_j S_ij (z_i - z_j)
    A = jnp.einsum("hd,hoi->oid", invs2, R, precision=_BWD)
    B = jnp.einsum("hd,hoid->oid", invs2, SZ, precision=_BWD)
    dz = 2.0 * (z * A - B)
    # d invs: d d2/dinvs_hd = 2 invs_hd (z_i - z_j)_d^2; the zi^2 + zj^2
    # terms reduce through R, the cross term through SZ (sum_ij S zi zj
    # = 2 sum_ij gd2 zi zj by symmetry)
    t12 = jnp.einsum("hoi,oid->hd", R, z * z, precision=_BWD)
    t3 = 0.5 * jnp.einsum("hoid,oid->hd", SZ, z, precision=_BWD)
    d_invs = 2.0 * invs * (t12 - 2.0 * t3)
    d_gamma2 = jnp.sum(g * K, axis=(1, 2, 3)) / jnp.maximum(gamma2, 1e-30)
    return dz, d_invs, d_gamma2


sym_gram_pallas.defvjp(_sym_gram_fwd, _sym_gram_bwd)
