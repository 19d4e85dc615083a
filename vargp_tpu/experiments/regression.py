"""Sparse-GP regression demo with the Gaussian likelihood.

The reference defines GaussianLikelihood (var_gp/likelihoods.py:66-110)
but never uses it in any experiment; this driver makes it a first-class
capability: single-task SVGP regression with Bayesian RBF hypers on a
synthetic 1-D function, trained with the same fused whitened-marginal
machinery as the classifiers.
"""

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vargp_tpu import gpmath
from vargp_tpu.kernels import (
    default_prior,
    gram,
    gram_diag,
    init_rbf,
    kl_hypers,
    sample_hypers,
)
from vargp_tpu.likelihoods import (
    GaussianLikParams,
    gaussian_loss,
    gaussian_predict,
    init_gaussian,
)
from vargp_tpu.utils import MetricsLogger, seed_everything


def _make_data(rng, n=256):
    x = np.sort(rng.uniform(-3, 3, n)).astype(np.float32)[:, None]
    y = (np.sin(3 * x[:, 0]) + 0.3 * x[:, 0]).astype(np.float32)
    y = y + 0.1 * rng.standard_normal(n).astype(np.float32)
    return x, y[None, :]  # targets: (out_size=1, N)


def _forward(params, x, key, n_v, n_f_unused=None, jitter=gpmath.DEFAULT_JITTER):
    theta = sample_hypers(key, params["kernel"], n_v)
    u_tril = gpmath.vec2tril(params["u_tril_vec"])
    Kzz = gram(theta, params["z"])
    L = gpmath.cholesky(Kzz, jitter)
    Kzx = gram(theta, params["z"], jnp.broadcast_to(x[None], (1, *x.shape)))
    mu, var = gpmath.whitened_marginal_diag(
        L, params["u_mean"], u_tril, Kzx, gram_diag(theta)
    )
    return mu, var, (L, u_tril)


def regression(
    epochs=800, M=24, lr=1e-2, n_var_samples=3, beta=1.0, seed=0,
    log_dir=None,
):
    """Train and report test RMSE; returns (params, rmse)."""
    key, seed = seed_everything(seed)
    log_dir = log_dir or os.path.join(
        os.environ.get("VARGP_TPU_LOGDIR", "runs"), "regression"
    )
    rng = np.random.default_rng(seed)
    x_np, y_np = _make_data(rng)
    x, y = jnp.asarray(x_np), jnp.asarray(y_np)

    k_init, key = jax.random.split(key)
    idx = rng.permutation(len(x_np))[:M]
    params = dict(
        z=jnp.asarray(x_np[idx])[None],  # (1, M, 1)
        u_mean=jnp.zeros((1, M, 1)),
        u_tril_vec=jnp.ones((1, (M * (M + 1)) // 2)) * 0.5,
        kernel=init_rbf(k_init, 1),
        lik=init_gaussian(1),
    )
    prior = default_prior(1)
    tx = optax.yogi(lr)
    opt = tx.init(params)
    n = x.shape[0]

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt, k):
        def total(p):
            mu, var, (L, u_tril) = _forward(p, x, k, n_var_samples)
            nll = gaussian_loss(p["lik"], mu, var, y)
            kl = gpmath.mvn_kl(
                p["u_mean"][..., 0], u_tril,
                jnp.zeros_like(p["u_mean"][..., 0]), L,
            )
            klu = jnp.mean(jnp.sum(kl, axis=-1))
            klh = kl_hypers(p["kernel"], prior)
            return beta * klh + klu + nll, nll

        (lv, nll), g = jax.value_and_grad(total, has_aux=True)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, lv, nll

    with MetricsLogger(log_dir) as logger:
        for e in range(epochs):
            key, k = jax.random.split(key)
            params, opt, lv, nll = step(params, opt, k)
            if (e + 1) % 100 == 0:
                logger.add_scalar("regression/loss", float(lv), step=e + 1)

    key, k = jax.random.split(key)
    mu, var, _ = _forward(params, x, k, 16)
    pred = np.asarray(gaussian_predict(params["lik"], mu, var)).mean(0)[0]
    rmse = float(np.sqrt(np.mean((pred - np.asarray(y)[0]) ** 2)))
    print(f"[regression] train RMSE {rmse:.4f} (noise sigma 0.1)")
    return params, rmse
