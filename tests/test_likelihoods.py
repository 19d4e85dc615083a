"""Likelihood tests: analytic limits + torch-oracle parity in distribution."""

import numpy as np
import jax
import jax.numpy as jnp

from vargp_tpu import likelihoods


def test_softmax_predict_zero_var_is_deterministic_softmax():
    rng = np.random.default_rng(0)
    H, O, B = 2, 4, 6
    mu = rng.standard_normal((H, O, B)).astype(np.float32)
    var = np.zeros((H, O, B), dtype=np.float32)

    probs = likelihoods.softmax_predict(
        jax.random.key(0), jnp.asarray(mu), jnp.asarray(var), n_f=3
    )
    expect = np.mean(
        [np.exp(mu[h]) / np.exp(mu[h]).sum(0, keepdims=True) for h in range(H)], axis=0
    ).T
    np.testing.assert_allclose(np.asarray(probs), expect, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)


def test_softmax_loss_zero_var_matches_cross_entropy():
    rng = np.random.default_rng(1)
    H, O, B = 3, 5, 8
    mu = rng.standard_normal((H, O, B)).astype(np.float32)
    var = np.zeros_like(mu)
    y = rng.integers(0, O, size=B)

    loss = likelihoods.softmax_loss(
        jax.random.key(0), jnp.asarray(mu), jnp.asarray(var), jnp.asarray(y), n_f=2
    )
    # mean over hypers, sum over batch of -log softmax picked
    logits = mu - np.log(np.exp(mu).sum(1, keepdims=True))
    picked = logits[:, y, np.arange(B)]
    expect = -picked.mean(0).sum()
    np.testing.assert_allclose(float(loss), expect, rtol=1e-4)


def test_softmax_loss_parity_with_reference_mc(reference_modules):
    """With nonzero variance the estimators are MC; compare expectations over
    many function draws."""
    import torch

    rng = np.random.default_rng(2)
    H, O, B = 2, 3, 4
    mu = rng.standard_normal((H, O, B)).astype(np.float32)
    var = (0.5 * np.abs(rng.standard_normal((H, O, B)))).astype(np.float32)
    y = rng.integers(0, O, size=B)

    ours = float(
        likelihoods.softmax_loss(
            jax.random.key(0), jnp.asarray(mu), jnp.asarray(var), jnp.asarray(y),
            n_f=4000,
        )
    )
    torch.manual_seed(0)
    ref = reference_modules["likelihoods"].MulticlassSoftmax(n_f=4000)
    theirs = float(ref.loss(torch.tensor(mu), torch.tensor(var), torch.tensor(y)))
    np.testing.assert_allclose(ours, theirs, rtol=0.02)


def test_gaussian_loss_matches_closed_form():
    rng = np.random.default_rng(3)
    H, O, B = 2, 3, 5
    mu = rng.standard_normal((H, O, B)).astype(np.float32)
    var = np.abs(rng.standard_normal((H, O, B))).astype(np.float32) + 0.1
    y = rng.standard_normal((O, B)).astype(np.float32)

    params = likelihoods.init_gaussian(O, init_log_var=-1.0)
    loss = likelihoods.gaussian_loss(
        params, jnp.asarray(mu), jnp.asarray(var), jnp.asarray(y)
    )
    obs_var = var + np.exp(-1.0)
    lp = -0.5 * (np.log(2 * np.pi) + np.log(obs_var) + (y[None] - mu) ** 2 / obs_var)
    expect = -lp.mean(0).mean(0).sum()
    np.testing.assert_allclose(float(loss), expect, rtol=1e-4)
