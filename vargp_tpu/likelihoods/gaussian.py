"""Independent multi-output Gaussian likelihood.

Parity: var_gp/likelihoods.py:66-110 (defined there but unused by any
experiment; provided for regression workloads).
"""

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


class GaussianLikParams(NamedTuple):
    obs_log_var: jax.Array  # (out_size,)


def init_gaussian(out_size: int, init_log_var: float = -4.0, dtype=jnp.float32):
    return GaussianLikParams(obs_log_var=init_log_var * jnp.ones((out_size,), dtype))


def _obs_moments(params: GaussianLikParams, mu: jax.Array, var: jax.Array):
    """mu, var: n_hypers x out_size x B -> observation mean/variance with the
    learned per-output noise added (likelihoods.py:75-89)."""
    obs_var = var + jnp.exp(params.obs_log_var)[None, :, None]
    return mu, obs_var


def gaussian_loss(
    params: GaussianLikParams, mu: jax.Array, var: jax.Array, y: jax.Array
) -> jax.Array:
    """-E[log N(y; mu, var + noise)], mean over hypers, mean over outputs'
    batch dim handling per reference: mean(hypers) mean(outputs) sum(batch)
    (likelihoods.py:91-107).

    y: out_size x B.
    """
    obs_mu, obs_var = _obs_moments(params, mu, var)
    log_prob = -0.5 * (
        math.log(2.0 * math.pi)
        + jnp.log(obs_var)
        + jnp.square(y[None] - obs_mu) / obs_var
    )
    # reference: Independent(...,1).log_prob over the trailing singleton then
    # .mean(0).mean(0).sum(0) == mean over hypers & outputs, sum over batch
    return -jnp.sum(jnp.mean(log_prob, axis=(0, 1)))


def gaussian_predict(
    params: GaussianLikParams, mu: jax.Array, var: jax.Array
) -> jax.Array:
    """Posterior predictive mean (likelihoods.py:109-110)."""
    return mu
