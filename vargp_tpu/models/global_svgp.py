"""Global continual SVGP baseline ("VAR-GP (Global)" ablation).

Parity: var_gp/models_global.py + var_gp/train_utils_global.py.  NOTE: the
reference versions are import-broken (``from .utils import vec2tril`` — no
such module; models_global.py:6, train_utils_global.py:12-13); this is the
re-designed *working* implementation mandated by SURVEY.md §7.4.

Model: a single global inducing set per class, grown per task by the
caller; continual regularization via the streaming-SVGP style correction
  u_prev_reg = E_{u ~ q_t(u_{t-1}|theta)}[log q_{t-1}(u) - log p_{t-1}(u)]
(models_global.py:208-224), with ELBO
  beta*kl_hypers + kl_u - u_prev_reg + (N/B)*nll  (train_utils_global.py:75).
"""

from dataclasses import dataclass
from typing import NamedTuple

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
from vargp_tpu.models.vargp import select_inducing


class GlobalPrev(NamedTuple):
    """Previous task's frozen variational state (models_global.py:135-139)."""

    z: jax.Array  # (O, M_prev, D)
    u_mean: jax.Array  # (O, M_prev, 1)
    u_tril: jax.Array  # (O, M_prev, M_prev)


class GlobalSVGPParams(NamedTuple):
    z: jax.Array  # (O, M, D)
    u_mean: jax.Array  # (O, M, 1)
    u_tril_vec: jax.Array  # (O, M(M+1)/2)
    kernel: RBFParams


@dataclass(frozen=True)
class GlobalSVGPConfig:
    M: int
    out_size: int
    in_size: int
    n_f: int = 10
    n_var_samples: int = 3
    map_est_hypers: bool = False
    jitter: float = gpmath.DEFAULT_JITTER


def _whiten(theta, z, x_rows, u_mean, u_tril, jitter, *, full_cov: bool):
    """Shared SVGP conditional machinery: returns (mu, var-or-cov, L).

    mu  = Kxz Kzz^{-1} u_mean
    cov = Kxx - Q + Kxz Kzz^{-1} S Kzz^{-1} Kzx  (diag only unless full_cov)
    (parity: models_global.py:32-117, via one whitened solve group)
    """
    Kzz = gram(theta, z)
    L = gpmath.cholesky(Kzz, jitter)
    Kzx = gram(theta, z, x_rows)

    M = z.shape[-2]
    rhs = jnp.concatenate(
        [
            jnp.broadcast_to(u_mean, (*L.shape[:-2], *u_mean.shape[-2:])),
            jnp.broadcast_to(u_tril, (*L.shape[:-2], *u_tril.shape[-2:])),
            Kzx,
        ],
        axis=-1,
    )
    sol = gpmath.tri_solve(L, rhs)
    Lm, LLS, W = sol[..., :1], sol[..., 1 : 1 + M], sol[..., 1 + M :]

    mu = jnp.einsum("...mi,...mb->...b", Lm, W, precision=_HIGHEST)
    C = jnp.einsum("...mi,...mb->...ib", LLS, W, precision=_HIGHEST)
    if full_cov:
        Kxx = gram(theta, x_rows)
        cov = (
            Kxx
            - jnp.einsum("...mb,...mc->...bc", W, W, precision=_HIGHEST)
            + jnp.einsum("...ib,...ic->...bc", C, C, precision=_HIGHEST)
        )
        # cache chol of the *evaluation* gram (models_global.py:114-115 Lkff)
        Lkff = gpmath.cholesky(Kxx, jitter)
        return mu, cov, Lkff
    diag1 = jnp.sum(jnp.square(W), axis=-2)
    diag2 = jnp.sum(jnp.square(C), axis=-2)
    return mu, diag1, diag2, L


def forward(
    params: GlobalSVGPParams,
    prev: GlobalPrev | None,
    x: jax.Array,
    key: jax.Array,
    cfg: GlobalSVGPConfig,
):
    """Diag predictive marginals + loss statistics (models_global.py:119-188)."""
    theta = sample_hypers(
        key, params.kernel, cfg.n_var_samples, map_est=cfg.map_est_hypers
    )
    u_tril = gpmath.vec2tril(params.u_tril_vec, cfg.M)
    xb = jnp.broadcast_to(x[None], (cfg.out_size, *x.shape))

    mu, diag1, diag2, Lkuu = _whiten(
        theta, params.z, xb, params.u_mean, u_tril, cfg.jitter, full_cov=False
    )
    # Clamp as in gpmath.whitened_marginal_diag: the inducing points here
    # ARE training rows (grow_inducing/select_inducing), so x == z occurs
    # exactly and f32 rounding can push the ~0 conditional variance
    # slightly negative -> NaN in the sqrt downstream.
    var = jnp.maximum(gram_diag(theta) - diag1 + diag2, 0.0)

    stats = dict(u_tril=u_tril, Lkuu=Lkuu, theta=theta)
    return mu, var, stats


def loss(
    params: GlobalSVGPParams,
    prev: GlobalPrev | None,
    prior: RBFPrior,
    x: jax.Array,
    y: jax.Array,
    key: jax.Array,
    cfg: GlobalSVGPConfig,
    weights: jax.Array | None = None,
):
    """(kl_hypers, kl_u, u_prev_reg, nll) — models_global.py:190-226."""
    k_fwd, k_lik, k_reg = jax.random.split(key, 3)
    mu, var, stats = forward(params, prev, x, k_fwd, cfg)
    nll = softmax_loss(k_lik, mu, var, y, cfg.n_f, weights=weights)

    klh = kl_hypers(params.kernel, prior, map_est=cfg.map_est_hypers)

    # KL(q(u_t) || N(0, Kzz)) per class, sum classes, mean hypers
    kl = gpmath.mvn_kl(
        params.u_mean[..., 0],
        stats["u_tril"],
        jnp.zeros_like(params.u_mean[..., 0]),
        stats["Lkuu"],
    )  # (H, O)
    kl_u = jnp.mean(jnp.sum(kl, axis=-1))

    u_prev_reg = jnp.zeros((), mu.dtype)
    if prev is not None:
        # q_t's density over the previous inducing values (full covariance)
        pred_mu, pred_cov, Lkff_prev = _whiten(
            stats["theta"], params.z, prev.z, params.u_mean, stats["u_tril"],
            cfg.jitter, full_cov=True,
        )
        pred_L = gpmath.cholesky(pred_cov, cfg.jitter)
        u_samples = gpmath.mvn_sample(
            k_reg, pred_mu, pred_L, sample_shape=(cfg.n_var_samples,)
        )  # (n_v, H, O, M_prev)

        # log q_{t-1}(u) - log p_{t-1}(u); p_{t-1} = N(0, K(z_{t-1}))
        log_q = gpmath.mvn_log_prob(u_samples, prev.u_mean[..., 0], prev.u_tril)
        log_p = gpmath.mvn_log_prob(
            u_samples, jnp.zeros_like(pred_mu), Lkff_prev
        )
        # (n_v, H, O): sum classes, mean samples & hypers
        u_prev_reg = jnp.mean(jnp.sum(log_q - log_p, axis=-1))

    return klh, kl_u, u_prev_reg, nll


def predict(
    params: GlobalSVGPParams,
    prev: GlobalPrev | None,
    x: jax.Array,
    key: jax.Array,
    cfg: GlobalSVGPConfig,
    *,
    n_f: int | None = None,
    n_var_samples: int | None = None,
):
    """Predictive class probabilities.  Eval-time MC budgets (n_f,
    n_var_samples) can be overridden, matching VARGP's predict and the
    notebooks' protocol (mnist.ipynb cell 12)."""
    from vargp_tpu.models.vargp import eval_budget_cfg

    cfg = eval_budget_cfg(cfg, n_f=n_f, n_var_samples=n_var_samples)
    k_fwd, k_lik = jax.random.split(key)
    mu, var, _ = forward(params, prev, x, k_fwd, cfg)
    return softmax_predict(k_lik, mu, var, cfg.n_f)


def init_params(
    key: jax.Array,
    z_init: jax.Array,
    cfg: GlobalSVGPConfig,
    *,
    kernel_prior_from: RBFParams | None = None,
) -> tuple[GlobalSVGPParams, RBFPrior]:
    """Parity: GlobalContinualSVGP.__init__ (models_global.py:9-30):
    u_mean ~ N(0, 0.5^2), u_tril_vec = ones (raw, incl. off-diagonal)."""
    k_kern, k_u = jax.random.split(key)
    kernel = init_rbf(k_kern, cfg.in_size)
    prior = (
        RBFPrior(kernel_prior_from.log_mean, kernel_prior_from.log_logvar)
        if kernel_prior_from is not None
        else default_prior(cfg.in_size)
    )
    u_mean = 0.5 * jax.random.normal(k_u, (cfg.out_size, cfg.M, 1))
    u_tril_vec = jnp.ones((cfg.out_size, (cfg.M * (cfg.M + 1)) // 2))
    return GlobalSVGPParams(z_init, u_mean, u_tril_vec, kernel), prior


def grow_inducing(
    key: jax.Array,
    prev_z: jax.Array,
    data: jax.Array,
    M_new: int,
    out_size: int,
) -> jax.Array:
    """Grow the global inducing set: keep previous rows, append M_new -
    M_prev random data rows per class (train_utils_global.py:16-39)."""
    M_prev = prev_z.shape[-2]
    M_add = M_new - M_prev
    if M_add <= 0:
        # fresh buffer: the result becomes a donated trainable while prev_z
        # stays referenced by the frozen chain
        return jnp.array(prev_z)
    z_add = select_inducing(key, data, M_add, out_size)
    return jnp.concatenate([prev_z, z_add], axis=-2)


def freeze_task(params: GlobalSVGPParams) -> GlobalPrev:
    return GlobalPrev(
        z=jax.lax.stop_gradient(params.z),
        u_mean=jax.lax.stop_gradient(params.u_mean),
        u_tril=jax.lax.stop_gradient(
            gpmath.vec2tril(params.u_tril_vec)
        ),
    )
