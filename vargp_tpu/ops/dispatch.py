"""Backend dispatch between XLA reference ops and Pallas TPU kernels.

The XLA implementations are the correctness reference; Pallas versions must
match them within tolerance (tests/test_pallas.py).  Dispatch is resolved at
trace time (backend is a host-side global), so the chosen implementation is
baked into each jitted program.
"""

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
    # Any TPU-like platform (tpu, or tunneled plugins) gets the Pallas path.
    return "pallas" if platform not in ("cpu", "gpu", "cuda", "rocm") else "xla"


# ---------------------------------------------------------------------------
# XLA reference implementations
# ---------------------------------------------------------------------------


def _sq_dist_xla(sx: jax.Array, sy: jax.Array) -> jax.Array:
    """Pairwise squared distances ||sx_i - sy_j||^2.

    sx: ... x M x D, sy: ... x N x D -> ... x M x N.  The cross term is the
    MXU matmul; the norms fuse into the surrounding elementwise ops.
    """
    xx = jnp.sum(jnp.square(sx), axis=-1)
    yy = jnp.sum(jnp.square(sy), axis=-1)
    xy = jnp.einsum("...md,...nd->...mn", sx, sy, precision=_HIGHEST)
    d2 = xx[..., :, None] - 2.0 * xy + yy[..., None, :]
    return jnp.maximum(d2, 0.0)


def _rbf_gram_xla(sx, sy, gamma2):
    """gamma2 * exp(-0.5 ||sx_i - sy_j||^2); gamma2 broadcastable."""
    return gamma2 * jnp.exp(-0.5 * _sq_dist_xla(sx, sy))


# ---------------------------------------------------------------------------
# Public dispatchers
# ---------------------------------------------------------------------------


def sq_dist(sx: jax.Array, sy: jax.Array) -> jax.Array:
    return _sq_dist_xla(sx, sy)


def rbf_gram(sx: jax.Array, sy: jax.Array, gamma2: jax.Array) -> jax.Array:
    """Fused RBF Gram matrix on pre-scaled inputs.

    sx: ... x M x D;  sy: ... x N x D;  gamma2: broadcastable to ... x M x N.
    """
    if get_backend() == "pallas":
        from vargp_tpu.ops.pallas.rbf_gram import rbf_gram_pallas

        return rbf_gram_pallas(sx, sy, gamma2)
    return _rbf_gram_xla(sx, sy, gamma2)


def batched_cholesky(K: jax.Array) -> jax.Array:
    """Batched lower Cholesky. XLA's lax.linalg path is already strong on
    TPU for the small-matrix-many-batches regime; a Pallas one-matrix-per-
    program kernel is available behind the same signature."""
    if get_backend() == "pallas":
        from vargp_tpu.ops.pallas.chol import cholesky_pallas

        return cholesky_pallas(K)
    return jnp.linalg.cholesky(K)
