"""Closed-form multivariate-normal operations (scale_tril parameterization).

The reference leans on ``torch.distributions.MultivariateNormal`` +
``kl_divergence`` (var_gp/vargp.py:177-194, vargp_retrain.py:191-233,
models_global.py:190-226).  Distribution objects don't fit a traced,
functional JAX hot path, so the three operations actually used — KL between
two MVNs, log-density, and reparameterized sampling — are provided as
closed-form batched primitives.
"""

import math

import jax
import jax.numpy as jnp

from vargp_tpu.gpmath.linalg import mm, tri3_blocks, tri_half_split, tri_solve, _HIGHEST


def _log_diag(L: jax.Array) -> jax.Array:
    # masked-reduce diagonal: jnp.diagonal lowers to a gather whose AD
    # transpose is a scatter-add (3.7 ms/step at M=1024 on v5e); the
    # eye-masked row-sum transposes to a cheap eye-broadcast multiply
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    return jnp.log(jnp.sum(L * eye, axis=-1))


def mvn_kl(
    mu_q: jax.Array,
    L_q: jax.Array,
    mu_p: jax.Array,
    L_p: jax.Array,
    Lp_inv: jax.Array | None = None,
) -> jax.Array:
    """KL( N(mu_q, L_q L_q^T) || N(mu_p, L_p L_p^T) ), batched.

    Arguments:
      mu_q, mu_p: ... x k
      L_q, L_p:   ... x k x k  lower-triangular scale factors
      Lp_inv: optional precomputed inverse of L_p (TPU matmul fast path)

    Returns: ... (batch of scalars)
    """
    k = mu_q.shape[-1]
    # tr(Sigma_p^{-1} Sigma_q) = || L_p^{-1} L_q ||_F^2
    Lq_b = jnp.broadcast_to(L_q, jnp.broadcast_shapes(L_q.shape, L_p.shape))
    diff = (mu_p - mu_q)[..., None]
    h = tri_half_split(k) if Lp_inv is not None else None
    if h is not None:
        # both factors are lower-triangular, so the product is too: a 2x2
        # block split skips the structurally-zero upper block (half the
        # matmul FLOPs at k=1024 — flops_audit) and the Frobenius trace
        # never needs the assembled matrix.  Shape-gated to k >= 512:
        # every parity protocol runs k <= 300, so their trajectories are
        # bit-identical.
        # tri3_blocks' hand VJP assembles each matrix's cotangent once
        # (vs three full pads summed — the movement audit's top m1024 term)
        a1, a2, a3 = tri3_blocks(Lp_inv, h)
        b1, b2, b3 = tri3_blocks(Lq_b, h)
        trace = (
            jnp.sum(jnp.square(mm(a1, b1)), axis=(-2, -1))
            + jnp.sum(jnp.square(mm(a2, b1) + mm(a3, b2)), axis=(-2, -1))
            + jnp.sum(jnp.square(mm(a3, b3)), axis=(-2, -1))
        )
        w = mm(Lp_inv, diff)
    elif Lp_inv is not None:
        M = mm(Lp_inv, Lq_b)
        w = mm(Lp_inv, diff)
        trace = jnp.sum(jnp.square(M), axis=(-2, -1))
    else:
        M = tri_solve(L_p, Lq_b)
        w = tri_solve(L_p, diff)
        trace = jnp.sum(jnp.square(M), axis=(-2, -1))
    maha = jnp.sum(jnp.square(w), axis=(-2, -1))
    # log|Sigma_p| - log|Sigma_q| = 2 (sum log diag L_p - sum log diag L_q)
    logdet = jnp.sum(_log_diag(L_p), axis=-1) - jnp.sum(_log_diag(L_q), axis=-1)
    return 0.5 * (trace + maha - k) + logdet


def mvn_log_prob(x: jax.Array, mu: jax.Array, L: jax.Array) -> jax.Array:
    """log N(x; mu, L L^T), batched over leading dims of x/mu/L.

    Arguments:
      x, mu: ... x k
      L:     ... x k x k

    Returns: ...
    """
    k = x.shape[-1]
    diff = (x - mu)[..., None]
    w = tri_solve(L, diff)
    maha = jnp.sum(jnp.square(w), axis=(-2, -1))
    logdet = jnp.sum(_log_diag(L), axis=-1)
    return -0.5 * (k * math.log(2.0 * math.pi) + maha) - logdet


def mvn_sample(
    key: jax.Array,
    mu: jax.Array,
    L: jax.Array,
    sample_shape: tuple = (),
) -> jax.Array:
    """Reparameterized samples mu + L eps, eps ~ N(0, I).

    Arguments:
      mu: ... x k
      L:  ... x k x k

    Returns: sample_shape x ... x k
    """
    batch = jnp.broadcast_shapes(mu.shape[:-1], L.shape[:-2])
    k = mu.shape[-1]
    eps = jax.random.normal(key, (*sample_shape, *batch, k), dtype=mu.dtype)
    return mu + jnp.einsum("...ij,...j->...i", L, eps, precision=_HIGHEST)


def diag_normal_kl(
    mu_q: jax.Array,
    logvar_q: jax.Array,
    mu_p: jax.Array,
    logvar_p: jax.Array,
) -> jax.Array:
    """Elementwise KL( N(mu_q, e^{logvar_q}) || N(mu_p, e^{logvar_p}) ).

    Used for the variational kernel-hyperparameter KL
    (parity: var_gp/kernels.py:70-77, which sums a factorized-normal KL).
    """
    var_ratio = jnp.exp(logvar_q - logvar_p)
    maha = jnp.square(mu_q - mu_p) * jnp.exp(-logvar_p)
    return 0.5 * (var_ratio + maha - 1.0 - logvar_q + logvar_p)
