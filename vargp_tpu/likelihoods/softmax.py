"""Monte-Carlo multiclass softmax likelihood.

Parity: var_gp/likelihoods.py:7-63.  n_f reparameterized function samples
per hyper-sample; the class axis is the softmax axis.  On a sharded mesh
the class ("model") axis all-gathers only here — everything upstream is
class-independent.
"""

import jax
import jax.numpy as jnp


def softmax_sample_logits(
    key: jax.Array, mu: jax.Array, var: jax.Array, n_f: int
) -> jax.Array:
    """Draw f ~ N(mu, var) per function sample and log-softmax over classes.

    mu, var: n_hypers x out_size x B  ->  n_hypers x n_f x out_size x B
    (likelihoods.py:13-31).
    """
    n_hypers, out_size, B = mu.shape
    eps = jax.random.normal(key, (n_hypers, n_f, out_size, B), mu.dtype)
    f = mu[:, None] + jnp.sqrt(var)[:, None] * eps
    return jax.nn.log_softmax(f, axis=-2)


def softmax_loss(
    key: jax.Array,
    mu: jax.Array,
    var: jax.Array,
    y: jax.Array,
    n_f: int,
    weights: jax.Array | None = None,
) -> jax.Array:
    """Expected NLL estimate: mean over (n_hypers, n_f), SUM over batch
    (likelihoods.py:33-47).

    ``weights`` (B,) masks padded batch rows (static-shape batching on TPU:
    the last partial minibatch is padded and zero-weighted instead of
    triggering a recompile)."""
    log_p = softmax_sample_logits(key, mu, var, n_f)  # H x F x O x B
    y_onehot = jax.nn.one_hot(y, log_p.shape[-2], dtype=log_p.dtype)  # B x O
    picked = jnp.einsum("hfob,bo->hfb", log_p, y_onehot)
    per_example = jnp.mean(picked, axis=(0, 1))  # (B,)
    if weights is not None:
        per_example = per_example * weights
    return -jnp.sum(per_example)


def softmax_predict(
    key: jax.Array, mu: jax.Array, var: jax.Array, n_f: int
) -> jax.Array:
    """Predictive class probabilities, B x out_size: MC average of softmax
    over all n_hypers * n_f samples via logsumexp (likelihoods.py:49-63)."""
    log_p = softmax_sample_logits(key, mu, var, n_f)  # H x F x O x B
    n = log_p.shape[0] * log_p.shape[1]
    flat = log_p.reshape(-1, *log_p.shape[-2:])
    probs = jnp.exp(jax.scipy.special.logsumexp(flat, axis=0)) / n
    return probs.T
