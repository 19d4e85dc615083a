"""Batched dense linear algebra for sparse-GP math.

Thin, broadcasting-aware wrappers over ``jax.lax.linalg`` (which XLA batches
natively on TPU) plus the jitter conventions of the reference
(var_gp/gp_utils.py:5-19).  The Pallas fast paths live in
``vargp_tpu.ops`` and are swapped in behind the same call signatures.
"""

import jax
import jax.numpy as jnp

DEFAULT_JITTER = 1e-4

# GP solves are precision-critical: force f32 MXU accumulation everywhere.
_HIGHEST = jax.lax.Precision.HIGHEST


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


def matmul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Batched matmul at HIGHEST precision (f32 accumulation on the MXU)."""
    return jnp.einsum("...ij,...jk->...ik", a, b, precision=_HIGHEST)
