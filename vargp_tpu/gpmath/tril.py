"""Packed lower-triangular parameterizations.

Variational covariance factors are stored as packed vectors of the
``m(m+1)/2`` lower-triangular entries; the diagonal is passed through a
softplus when unpacking so the resulting Cholesky factor always has a
strictly positive diagonal.

Parity: var_gp/gp_utils.py:22-65 (vec2tril with softplus diagonal,
mat2trilvec).  TPU-first notes: unpacking is done with a static scatter
index (precomputed ``tril_indices``) so it lowers to a single gather/
scatter instead of boolean masking; everything is ``vmap``-safe over
arbitrary leading batch dims.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def tril_indices(m: int):
    """Static (rows, cols) index arrays for the lower triangle of an m x m."""
    rows, cols = np.tril_indices(m)
    return np.asarray(rows, dtype=np.int32), np.asarray(cols, dtype=np.int32)


def tril_size(m: int) -> int:
    """Number of packed entries for an m x m lower triangle."""
    return (m * (m + 1)) // 2


def tril_dim(d: int) -> int:
    """Invert tril_size: matrix dim m such that m(m+1)/2 == d."""
    m = int((math.sqrt(8.0 * d + 1.0) - 1.0) / 2.0)
    if tril_size(m) != d:
        raise ValueError(f"{d} is not a valid packed-triangle length")
    return m


@functools.lru_cache(maxsize=None)
def _unpack_gather_index(m: int):
    """Static (m, m) gather index into the packed vector: entry (i, j) maps
    to the packed position of (i, j) for i >= j, else 0 (masked out).

    TPU note: a gather with a static index matrix lowers to one efficient
    gather; the scatter formulation (.at[idx].set) costs milliseconds."""
    rows, cols = tril_indices(m)
    idx = np.zeros((m, m), dtype=np.int32)
    idx[rows, cols] = np.arange(rows.shape[0], dtype=np.int32)
    mask = np.zeros((m, m), dtype=bool)
    mask[rows, cols] = True
    return idx, mask


@functools.lru_cache(maxsize=None)
def _packed_diag_mask(m: int):
    """Static boolean mask over the packed axis: True at diagonal entries."""
    rows, cols = tril_indices(m)
    return rows == cols


def _vec2tril_impl(m: int, vec: jax.Array) -> jax.Array:
    idx, mask = _unpack_gather_index(m)
    gathered = vec[..., jnp.asarray(idx.reshape(-1))].reshape(*vec.shape[:-1], m, m)
    tril = jnp.where(jnp.asarray(mask), gathered, 0.0)

    diag = jax.nn.softplus(jnp.diagonal(tril, axis1=-2, axis2=-1))
    eye = jnp.eye(m, dtype=tril.dtype)
    return tril * (1.0 - eye) + diag[..., None] * eye


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _vec2tril_p(m: int, vec: jax.Array) -> jax.Array:
    return _vec2tril_impl(m, vec)


def _vec2tril_fwd(m, vec):
    return _vec2tril_impl(m, vec), vec


def _vec2tril_bwd(m, vec, g):
    # The AD transpose of the unpack gather is a scatter-add into the
    # packed vector — 135 ms/step at M=1024 on v5e (70% of the step).
    # The hand rule is just the reverse gather (one cheap advanced-index
    # read of the lower triangle) with the softplus chain on the diagonal.
    rows, cols = tril_indices(m)
    packed_cot = g[..., jnp.asarray(rows), jnp.asarray(cols)]
    mult = jnp.where(
        jnp.asarray(_packed_diag_mask(m)), jax.nn.sigmoid(vec), 1.0
    )
    return (packed_cot * mult,)


_vec2tril_p.defvjp(_vec2tril_fwd, _vec2tril_bwd)


def _check_packed_len(vec: jax.Array, m: int, who: str) -> None:
    """An explicit m that mismatches the packed length must raise: the
    unpack gather would otherwise CLAMP out-of-bounds indices and return a
    silently corrupted factor (e.g. a checkpoint trained at a different M,
    or a cfg.M typo)."""
    if vec.shape[-1] != tril_size(m):
        raise ValueError(
            f"{who}: packed length {vec.shape[-1]} does not match m={m} "
            f"(expected {tril_size(m)})"
        )


def vec2tril(vec: jax.Array, m: int | None = None) -> jax.Array:
    """Unpack ``... x m(m+1)/2`` vectors into ``... x m x m`` lower-triangular
    matrices, applying softplus to the diagonal for positivity.
    """
    if m is None:
        m = tril_dim(vec.shape[-1])
    else:
        _check_packed_len(vec, m, "vec2tril")
    return _vec2tril_p(m, vec)


# ---------------------------------------------------------------------------
# "Filled" packed layout: gather-free unpacking for the training hot path.
#
# XLA lowers the row-major unpack above to one big gather (and its VJP to a
# pack gather); at M=1024 those two ops are 14 ms of a 39 ms step on v5e —
# TPU gathers run at element rate, not lane rate.  The fix is the classic
# fill_triangular layout (cf. tensorflow_probability.math.fill_triangular):
# store the packed vector in the order for which
#
#     concat([vec[m:], reverse(vec)]).reshape(m, m)
#
# lands every lower-triangular entry in its place exactly once.  Unpacking
# is then concat + flip + reshape + select — all lane-width data movement,
# and its AD transpose is slice + flip + pad (no scatter).  The layout is a
# fixed permutation of the row-major packing, applied once per train-block
# dispatch (train.loop), never per step; the public ``vec2tril`` contract
# (row-major, reference parity) is unchanged.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def filled_perm(m: int) -> np.ndarray:
    """Static permutation p with ``filled_vec = rowmajor_vec[..., p]``.

    Derivation: unpacking reads the filled vector at flat grid position
    k = i*m + j as ``xc[k]`` where xc = concat([vec[m:], reverse(vec)]),
    i.e. at vec index u(k) = m + k for k < n - m, else 2n - m - 1 - k.
    Inverting u over the lower-triangular k's gives the storage order."""
    n = tril_size(m)
    rows, cols = tril_indices(m)
    k = rows.astype(np.int64) * m + cols.astype(np.int64)
    u = np.where(k < n - m, m + k, 2 * n - m - 1 - k)
    assert np.unique(u).shape[0] == n, "fill layout must be a bijection"
    p = np.empty(n, dtype=np.int32)
    p[u] = np.arange(n, dtype=np.int32)
    return p


@functools.lru_cache(maxsize=None)
def _filled_perm_inv(m: int) -> np.ndarray:
    p = filled_perm(m)
    inv = np.empty_like(p)
    inv[p] = np.arange(p.shape[0], dtype=np.int32)
    return inv


def rowmajor_to_filled(vec: jax.Array, m: int | None = None) -> jax.Array:
    """Re-order a row-major packed vector into the filled layout (one
    gather — boundary use only, never inside the step)."""
    if m is None:
        m = tril_dim(vec.shape[-1])
    else:
        _check_packed_len(vec, m, "rowmajor_to_filled")
    return vec[..., jnp.asarray(filled_perm(m))]


def filled_to_rowmajor(vec: jax.Array, m: int | None = None) -> jax.Array:
    """Inverse of :func:`rowmajor_to_filled`."""
    if m is None:
        m = tril_dim(vec.shape[-1])
    else:
        _check_packed_len(vec, m, "filled_to_rowmajor")
    return vec[..., jnp.asarray(_filled_perm_inv(m))]


@functools.lru_cache(maxsize=None)
def _tril_masks(m: int):
    eye = np.eye(m, dtype=bool)
    strict = np.tril(np.ones((m, m), dtype=bool), -1)
    return eye, strict


def _filled_grid(vec: jax.Array, m: int) -> jax.Array:
    """The (…, m, m) fill_triangular grid (lower triangle = packed
    entries, upper = duplicates to be masked)."""
    xc = jnp.concatenate([vec[..., m:], jnp.flip(vec, axis=-1)], axis=-1)
    return xc.reshape(*vec.shape[:-1], m, m)


def _tril_from_filled_impl(m: int, vec: jax.Array) -> jax.Array:
    W = _filled_grid(vec, m)
    eye, strict = _tril_masks(m)
    return jnp.where(
        jnp.asarray(eye),
        jax.nn.softplus(W),
        jnp.where(jnp.asarray(strict), W, 0.0),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _tril_from_filled_p(m: int, vec: jax.Array) -> jax.Array:
    return _tril_from_filled_impl(m, vec)


def _tril_from_filled_fwd(m, vec):
    return _tril_from_filled_impl(m, vec), vec


def _tril_from_filled_bwd(m, vec, g):
    # Hand transpose so the diagonal chain is jax.nn.sigmoid — BIT-exact
    # against vec2tril's hand VJP (jax.nn.softplus's autodiff derivative
    # differs by an ulp).  The masked (upper) copies carry zero cotangent,
    # so the two-segment accumulation below adds exact zeros.
    n = tril_size(m)
    eye, strict = _tril_masks(m)
    W = _filled_grid(vec, m)
    dW = jnp.where(
        jnp.asarray(eye),
        jax.nn.sigmoid(W) * g,
        jnp.where(jnp.asarray(strict), g, 0.0),
    )
    dxc = dW.reshape(*vec.shape[:-1], m * m)
    d_a = dxc[..., : n - m]  # cotangent for vec[m:]
    d_b = jnp.flip(dxc[..., n - m :], axis=-1)  # cotangent for vec
    pad = [(0, 0)] * (vec.ndim - 1) + [(m, 0)]
    return (jnp.pad(d_a, pad) + d_b,)


_tril_from_filled_p.defvjp(_tril_from_filled_fwd, _tril_from_filled_bwd)


def tril_from_filled(vec: jax.Array, m: int | None = None) -> jax.Array:
    """Gather-free ``vec2tril`` for a FILLED-layout packed vector.

    Numerically identical (bit-exact, forward AND backward, tested) to
    ``vec2tril(filled_to_rowmajor(vec))``: same entries, same softplus /
    sigmoid chain on the diagonal; only the packing order differs."""
    if m is None:
        m = tril_dim(vec.shape[-1])
    else:
        _check_packed_len(vec, m, "tril_from_filled")
    return _tril_from_filled_p(m, vec)


def mat2trilvec(mat: jax.Array) -> jax.Array:
    """Pack ``... x m x m`` matrices into their ``... x m(m+1)/2`` lower
    triangles (no transform applied — inverse of vec2tril's layout only)."""
    m = mat.shape[-1]
    rows, cols = tril_indices(m)
    return mat[..., rows, cols]


def identity_trilvec(out_size: int, m: int, dtype=jnp.float32) -> jax.Array:
    """Packed vector whose vec2tril is the identity: zeros off-diagonal and
    softplus^{-1}(1) on the diagonal so the unpacked diagonal is exactly 1."""
    inv_softplus_one = math.log(math.expm1(1.0))
    rows, cols = tril_indices(m)
    diag_mask = rows == cols
    vec = np.where(diag_mask, inv_softplus_one, 0.0).astype(np.float32)
    return jnp.broadcast_to(jnp.asarray(vec, dtype=dtype), (out_size, tril_size(m)))
