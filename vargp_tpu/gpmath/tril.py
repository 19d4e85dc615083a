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


def vec2tril(vec: jax.Array, m: int | None = None) -> jax.Array:
    """Unpack ``... x m(m+1)/2`` vectors into ``... x m x m`` lower-triangular
    matrices, applying softplus to the diagonal for positivity.
    """
    if m is None:
        m = tril_dim(vec.shape[-1])
    return _vec2tril_p(m, vec)


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
