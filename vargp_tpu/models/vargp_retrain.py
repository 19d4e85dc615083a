"""VARGP-Retrain ablation: past variational parameters are re-optimized.

Parity: var_gp/vargp_retrain.py.  All tasks' (z, u_mean, u_tril_vec) are
trainable; the ELBO regularizes with KL(q(u_{<=t}) || p(u_{<=t}|theta))
plus an importance term E[log p(u~_{<t}) - log q~(u~_{<t})] where u~ is
drawn through the chain conditional at the ORIGINAL (frozen) inducing
points (vargp_retrain.py:119-233).  Toy-scale model; uses the same fused
one-Cholesky chain machinery as VARGP.
"""

from dataclasses import dataclass
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from vargp_tpu import gpmath
from vargp_tpu.gpmath.linalg import _HIGHEST
from vargp_tpu.kernels import (
    RBFParams,
    RBFPrior,
    default_prior,
    gram,
    gram_diag,
    init_rbf,
    kl_hypers,
    sample_hypers,
)
from vargp_tpu.likelihoods import softmax_loss, softmax_predict
from vargp_tpu.models.vargp import TaskPosterior


class TaskRaw(NamedTuple):
    """One task's raw trainable parameters."""

    z: jax.Array  # (O, M, D)
    u_mean: jax.Array  # (O, M, 1)
    u_tril_vec: jax.Array  # (O, M(M+1)/2)


class RetrainParams(NamedTuple):
    tasks: tuple  # TaskRaw per task, current task last
    kernel: RBFParams


@dataclass(frozen=True)
class RetrainConfig:
    M: int
    out_size: int
    in_size: int
    n_f: int = 10
    n_var_samples: int = 3
    map_est_hypers: bool = False
    jitter: float = gpmath.DEFAULT_JITTER


def _chain(theta, tasks: Sequence[TaskRaw], jitter):
    """Gram + chol + AR joint posterior over a task list."""
    z_all = jnp.concatenate([t.z for t in tasks], axis=-2)
    L = gpmath.cholesky(gram(theta, z_all), jitter)
    post = gpmath.ar_joint_posterior(
        L,
        [t.u_mean for t in tasks],
        [gpmath.vec2tril(t.u_tril_vec) for t in tasks],
    )
    return z_all, L, post


def forward(
    params: RetrainParams,
    x: jax.Array,
    theta: jax.Array,
    cfg: RetrainConfig,
):
    z_all, L, post = _chain(theta, params.tasks, cfg.jitter)
    xb = jnp.broadcast_to(x[None], (cfg.out_size, *x.shape))
    Kzx = gram(theta, z_all, xb)
    f_mean, f_var = gpmath.whitened_marginal_diag(
        L, post.mean, post.LS, Kzx, gram_diag(theta)
    )
    return f_mean, f_var, (z_all, L, post)


def loss(
    params: RetrainParams,
    frozen_prev: Sequence[TaskPosterior],
    prior: RBFPrior,
    x: jax.Array,
    y: jax.Array,
    key: jax.Array,
    cfg: RetrainConfig,
    weights: jax.Array | None = None,
):
    """(kl_hypers, kl_u, nll) with the importance correction folded into
    kl_u (parity: vargp_retrain.py:191-233)."""
    k_hyp, k_lik, k_u, k_ut = jax.random.split(key, 4)
    theta = sample_hypers(
        k_hyp, params.kernel, cfg.n_var_samples, map_est=cfg.map_est_hypers
    )

    f_mean, f_var, (z_all, L, post) = forward(params, x, theta, cfg)
    nll = softmax_loss(k_lik, f_mean, f_var, y, cfg.n_f, weights=weights)
    klh = kl_hypers(params.kernel, prior, map_est=cfg.map_est_hypers)

    if frozen_prev:
        # KL(q(u_{<=t}) || N(0, K(z_{<=t}))): sum classes, mean hypers
        kl = gpmath.mvn_kl(
            post.mean[..., 0], post.LS, jnp.zeros_like(post.mean[..., 0]), L
        )  # (H, O)
        kl_u = jnp.mean(jnp.sum(kl, axis=-1))

        # old chain q~ over the ORIGINAL frozen parameters
        z_tilde = jnp.concatenate([p.z for p in frozen_prev], axis=-2)
        L_tilde = gpmath.cholesky(gram(theta, z_tilde), cfg.jitter)
        post_tilde = gpmath.ar_joint_posterior(
            L_tilde,
            [p.u_mean for p in frozen_prev],
            [p.u_tril for p in frozen_prev],
        )

        # u_{<=t} ~ q (no reparam gradient: reference uses .sample,
        # vargp_retrain.py:155)
        u_leq = jax.lax.stop_gradient(
            gpmath.mvn_sample(
                k_u, post.mean[..., 0], post.LS, sample_shape=(cfg.n_var_samples,)
            )
        )  # (n_v, H, O, SM)

        # conditional p(u~_{<t} | u_{<=t}, theta) at the frozen z's
        Kzx_t = gram(theta, z_all, z_tilde)
        W = gpmath.tri_solve(L, Kzx_t)
        cond_mu = jnp.einsum(
            "...mi,...mb->...ib",
            gpmath.tri_solve(L, u_leq[..., None]),
            W,
            precision=_HIGHEST,
        )[..., 0, :]  # (n_v, H, O, c)
        Ktt = gram(theta, z_tilde)
        cond_cov = Ktt - jnp.einsum("...mb,...mc->...bc", W, W, precision=_HIGHEST)
        cond_L = gpmath.cholesky(cond_cov, cfg.jitter)

        u_tilde = jax.lax.stop_gradient(
            gpmath.mvn_sample(
                k_ut, cond_mu, cond_L, sample_shape=(cfg.n_var_samples,)
            )
        )  # (n_v, n_v, H, O, c)

        log_p = gpmath.mvn_log_prob(u_tilde, jnp.zeros_like(cond_mu), L_tilde)
        log_q = gpmath.mvn_log_prob(u_tilde, post_tilde.mean[..., 0], post_tilde.LS)
        # sum classes, mean over hypers and both sample axes
        tilde_ratio = jnp.mean(jnp.sum(log_p - log_q, axis=-1))

        kl_u = kl_u + tilde_ratio
    else:
        u_tril = gpmath.vec2tril(params.tasks[-1].u_tril_vec, cfg.M)
        kl = gpmath.mvn_kl(
            params.tasks[-1].u_mean[..., 0],
            u_tril,
            jnp.zeros_like(params.tasks[-1].u_mean[..., 0]),
            L,
        )
        kl_u = jnp.mean(jnp.sum(kl, axis=-1))

    return klh, kl_u, nll


def predict(
    params: RetrainParams,
    x: jax.Array,
    key: jax.Array,
    cfg: RetrainConfig,
):
    k_hyp, k_lik = jax.random.split(key)
    theta = sample_hypers(
        k_hyp, params.kernel, cfg.n_var_samples, map_est=cfg.map_est_hypers
    )
    f_mean, f_var, _ = forward(params, x, theta, cfg)
    return softmax_predict(k_lik, f_mean, f_var, cfg.n_f)


def init_params(
    key: jax.Array,
    z_init: jax.Array,
    cfg: RetrainConfig,
    prev_chain: Sequence[TaskRaw] = (),
    kernel_prior_from: RBFParams | None = None,
) -> tuple[RetrainParams, RBFPrior, tuple]:
    """New task init; previous tasks' raw params become trainable again
    (vargp_retrain.py:17-25).  Returns (params, prior, frozen_prev) where
    frozen_prev snapshots the ORIGINAL chain for the importance term."""
    k_kern, k_u = jax.random.split(key)
    kernel = init_rbf(k_kern, cfg.in_size)
    prior = (
        RBFPrior(kernel_prior_from.log_mean, kernel_prior_from.log_logvar)
        if kernel_prior_from is not None
        else default_prior(cfg.in_size)
    )
    u_mean = 0.5 * jax.random.normal(k_u, (cfg.out_size, cfg.M, 1))
    # reference init: raw ones incl. off-diagonal (vargp_retrain.py:37)
    u_tril_vec = jnp.ones((cfg.out_size, (cfg.M * (cfg.M + 1)) // 2))

    current = TaskRaw(z=z_init, u_mean=u_mean, u_tril_vec=u_tril_vec)
    frozen_prev = tuple(
        TaskPosterior(
            z=jax.lax.stop_gradient(t.z),
            u_mean=jax.lax.stop_gradient(t.u_mean),
            u_tril=jax.lax.stop_gradient(gpmath.vec2tril(t.u_tril_vec)),
        )
        for t in prev_chain
    )
    params = RetrainParams(tasks=(*prev_chain, current), kernel=kernel)
    return params, prior, frozen_prev
