"""RBF-ARD kernel with variational log-hyperparameters.

Parity: var_gp/kernels.py:7-77.  theta = (log lengthscales[D], log scale);
q(theta) = N(log_mean, diag exp(log_logvar)); n_hypers reparameterized
samples flow through the whole ELBO.

TPU-first notes: the Gram evaluation pre-scales inputs per hyper-sample and
calls the fused ``ops.rbf_gram`` (MXU matmul + elementwise exp); hyper and
class axes ride as leading batch dims end to end.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vargp_tpu.gpmath.mvn import diag_normal_kl
from vargp_tpu.ops.dispatch import rbf_gram


class RBFParams(NamedTuple):
    """Trainable variational posterior over log-hyperparameters."""

    log_mean: jax.Array  # (D + 1,)
    log_logvar: jax.Array  # (D + 1,)


class RBFPrior(NamedTuple):
    """Frozen prior over log-hyperparameters (chained across tasks)."""

    log_mean: jax.Array  # (D + 1,)
    log_logvar: jax.Array  # (D + 1,)


def init_rbf(key: jax.Array, in_size: int, dtype=jnp.float32) -> RBFParams:
    """Init mirrors the reference: log_mean = log(0.5) + 0.05 * N(0,1),
    log_logvar = -2 (kernels.py:14-17)."""
    noise = 0.05 * jax.random.normal(key, (in_size + 1,), dtype=dtype)
    return RBFParams(
        log_mean=jnp.log(jnp.asarray(0.5, dtype)) + noise,
        log_logvar=-2.0 * jnp.ones((in_size + 1,), dtype),
    )


def default_prior(in_size: int, dtype=jnp.float32) -> RBFPrior:
    """Standard-normal prior over log-hypers (kernels.py:19-22)."""
    return RBFPrior(
        log_mean=jnp.zeros((in_size + 1,), dtype),
        log_logvar=jnp.zeros((in_size + 1,), dtype),
    )


def sample_hypers(
    key: jax.Array, params: RBFParams, n_hypers: int, *, map_est: bool = False
) -> jax.Array:
    """theta ~ q(theta), reparameterized; (n_hypers, D+1).  With map_est the
    point estimate log_mean is used (a single 'sample')."""
    if map_est:
        return params.log_mean[None, :]
    std = jnp.exp(0.5 * params.log_logvar)
    eps = jax.random.normal(key, (n_hypers, *params.log_mean.shape), params.log_mean.dtype)
    return params.log_mean + std * eps


def kl_hypers(params: RBFParams, prior: RBFPrior, *, map_est: bool = False) -> jax.Array:
    """KL(q(theta) || p(theta)), summed over dims; 0 under MAP
    (kernels.py:70-77)."""
    if map_est:
        return jnp.zeros((), params.log_mean.dtype)
    return jnp.sum(
        diag_normal_kl(
            params.log_mean, params.log_logvar, prior.log_mean, prior.log_logvar
        )
    )


def _split_theta(theta: jax.Array, n_batch_dims: int):
    """theta: (n_hypers, D+1) -> per-sample lengthscales sigma and scale
    gamma2, shaped to broadcast over ``n_batch_dims`` trailing batch axes."""
    shape = (theta.shape[0], *([1] * n_batch_dims))
    sigma = jnp.exp(theta[:, :-1]).reshape(*shape, -1)
    gamma2 = jnp.exp(2.0 * theta[:, -1]).reshape(*shape, 1)
    return sigma, gamma2


def gram(theta: jax.Array, x: jax.Array, y: jax.Array | None = None,
         precision: str = "highest") -> jax.Array:
    """Batched RBF Gram matrix (kernels.py:24-56).

    Arguments:
      theta: (n_hypers, D+1) sampled log-hyperparameters.
      x: ...batch x M x D
      y: ...batch x N x D or None (y = x)

    Returns: n_hypers x ...batch x M x N
    """
    n_batch = x.ndim - 1  # hyper axis is prepended; batch dims + row dim
    sigma, gamma2 = _split_theta(theta, n_batch - 1)
    sx = x[None] / sigma[..., None, :]
    sy = sx if y is None else y[None] / sigma[..., None, :]
    return rbf_gram(sx, sy, gamma2[..., None], precision=precision)


def sym_gram(theta: jax.Array, z: jax.Array,
             precision: str = "highest") -> jax.Array:
    """K(z, z) for class-stacked z (O, M, D) with scaling fused into the
    Gram kernel (no per-hyper (H, O, M, D) materialization).

    Numerically identical to ``gram(theta, z)`` (tested); this is the
    production Kzz path for the non-DKL model (reference:
    var_gp/kernels.py:44-54 with x = y)."""
    from vargp_tpu.ops.dispatch import sym_gram as _sym_gram_dispatch

    invs = jnp.exp(-theta[:, :-1])  # (H, D)
    gamma2 = jnp.exp(2.0 * theta[:, -1])  # (H,)
    return _sym_gram_dispatch(z, invs, gamma2, precision)


def gram_diag(theta: jax.Array) -> jax.Array:
    """Diagonal of k(x,x) = gamma^2, shaped (n_hypers, 1, 1)
    (kernels.py:58-60)."""
    return jnp.exp(2.0 * theta[:, -1])[:, None, None]


# ---------------------------------------------------------------------------
# Specialized cross-Gram: shared x across class heads
# ---------------------------------------------------------------------------
#
# The predictive marginal needs K(z_all, x) where x (the data batch) is the
# SAME for every class head while z carries an (out_size,) axis.  Routing it
# through ``gram`` broadcasts x to (H, O, B, D) — at bench shapes a 47 MB
# materialization in the forward AND in every AD cotangent (device trace:
# ~0.6 ms of backward dot_generals + relayouts).  This formulation keeps x
# un-broadcast: the only O(H*O*M*B) object is the Gram itself, the widest
# intermediate is (H, B, D), and the hand-derived VJP never forms a
# per-class cotangent for x (x is data — no gradient).


def _cross_gram_fwd_math(z, x, invs2, gamma2, prec):
    # Forward K: Pallas kernel on TPU (emits the consumed (H, O, M, B)
    # layout directly — the einsum dot_general emits (O, M, H, B) and pays
    # a relayout transpose, 123 MB/batch at analysis MC budgets), XLA math
    # elsewhere; partitioned wrapper when a mesh is live (ops/partition).
    from vargp_tpu.ops.partition import cross_gram_partitioned, partition_enabled
    from vargp_tpu.ops.pallas.rbf_gram import _cross_gram_impl

    if partition_enabled():
        K = cross_gram_partitioned(z, x, invs2, gamma2, prec)
    else:
        K = _cross_gram_impl(z, x, invs2, gamma2, prec)
    # xs is a VJP residual only — dead-code-eliminated in primal-only use
    xs = x[None] * invs2[:, None, :]  # (H, B, D)
    return K, xs


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _cross_gram_p(z, x, invs2, gamma2, prec):
    K, _ = _cross_gram_fwd_math(z, x, invs2, gamma2, prec)
    return K


def _cross_gram_p_fwd(z, x, invs2, gamma2, prec):
    K, xs = _cross_gram_fwd_math(z, x, invs2, gamma2, prec)
    return K, (z, x, invs2, gamma2, xs, K)


def _cross_gram_p_bwd(prec, res, g):
    z, x, invs2, gamma2, xs, K = res
    W = g * K  # (H, O, M, B)
    gd2 = -0.5 * W
    R = jnp.sum(gd2, axis=-1)  # (H, O, M)
    C = jnp.sum(gd2, axis=(1, 2))  # (H, B)

    # dz: zz term (outer, cheap) + cross term (the one big contraction)
    t_zz = 2.0 * z * jnp.einsum("hoi,hd->oid", R, invs2, precision=prec)
    t_cross = -2.0 * jnp.einsum("hoib,hbd->oid", gd2, xs, precision=prec)
    dz = t_zz + t_cross

    # d(invs2): zz + xx + cross contributions, each reduced to (H, D)
    P = jnp.einsum("hoib,oid->hbd", gd2, z, precision=prec)  # (H, B, D)
    d_invs2 = (
        jnp.einsum("hoi,oid->hd", R, z * z, precision=prec)
        + jnp.einsum("hb,bd->hd", C, x * x, precision=prec)
        - 2.0 * jnp.einsum("hbd,bd->hd", P, x, precision=prec)
    )
    d_gamma2 = jnp.sum(g * K, axis=(1, 2, 3)) / gamma2
    return dz, jnp.zeros_like(x), d_invs2, d_gamma2


_cross_gram_p.defvjp(_cross_gram_p_fwd, _cross_gram_p_bwd)


def cross_gram(theta: jax.Array, z: jax.Array, x: jax.Array,
               precision: str = "high") -> jax.Array:
    """K(z, x) for class-stacked z (O, M, D) against a shared batch x (B, D).

    Returns (n_hypers, O, M, B) — numerically identical to
    ``gram(theta, z, broadcast(x))`` (tested) with no per-class x
    materialization.  Default bf16x3: the cross-Gram is never factorized.
    """
    from vargp_tpu.ops.dispatch import resolve_precision

    prec = resolve_precision(precision)
    invs2 = jnp.exp(-2.0 * theta[:, :-1])  # (H, D)
    gamma2 = jnp.exp(2.0 * theta[:, -1])  # (H,)
    # x is data by contract: the hand VJP carries NO x cotangent, so make
    # that explicit here rather than letting a future caller silently get
    # zeros.  Input-sensitivity / DKL feature paths must differentiate
    # through the features BEFORE calling cross_gram (models/vargp.py does).
    return _cross_gram_p(z, jax.lax.stop_gradient(x), invs2, gamma2, prec)
