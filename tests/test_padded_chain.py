"""Padded-chain compilation must be EXACT vs the unpadded computation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vargp_tpu import gpmath
from vargp_tpu.kernels import RBFParams, default_prior
from vargp_tpu.models import vargp as M


def setup(n_prev, seed=0, D=3, out=2, Mi=5, B=6):
    rng = np.random.default_rng(seed)
    f32 = np.float32
    prev = tuple(
        M.TaskPosterior(
            z=jnp.asarray(rng.standard_normal((out, Mi, D)).astype(f32)),
            u_mean=jnp.asarray(rng.standard_normal((out, Mi, 1)).astype(f32) * 0.4),
            u_tril=gpmath.vec2tril(
                jnp.asarray(rng.standard_normal((out, (Mi * (Mi + 1)) // 2)).astype(f32) * 0.3)
            ),
        )
        for _ in range(n_prev)
    )
    params = M.VARGPParams(
        z=jnp.asarray(rng.standard_normal((out, Mi, D)).astype(f32)),
        u_mean=jnp.asarray(rng.standard_normal((out, Mi, 1)).astype(f32) * 0.4),
        u_tril_vec=jnp.asarray(
            rng.standard_normal((out, (Mi * (Mi + 1)) // 2)).astype(f32) * 0.3
        ),
        kernel=RBFParams(
            log_mean=jnp.asarray((rng.standard_normal(D + 1) * 0.2).astype(f32)),
            log_logvar=jnp.asarray((-2 * np.ones(D + 1)).astype(f32)),
        ),
    )
    cfg = M.VARGPConfig(
        M=Mi, out_size=out, in_size=D, n_f=6, n_var_samples=2,
        map_est_hypers=True,  # deterministic theta for exact comparison
    )
    x = jnp.asarray(rng.standard_normal((B, D)).astype(f32))
    y = jnp.asarray(rng.integers(0, out, B))
    return params, prev, cfg, x, y


@pytest.mark.slow
def test_padded_forward_matches_unpadded():
    for n_prev in (0, 1, 2):
        params, prev, cfg, x, y = setup(n_prev, seed=n_prev)
        prior = default_prior(cfg.in_size)
        key = jax.random.key(0)

        base = M.forward(params, prev, prior, x, key, cfg, with_kl=True)
        padded, mask = M.pad_chain(prev, cfg, t_max=4)
        pad = M.forward(
            params, padded, prior, x, key, cfg, with_kl=True, chain_mask=mask
        )

        np.testing.assert_allclose(
            np.asarray(pad.f_mean), np.asarray(base.f_mean), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(pad.f_var), np.asarray(base.f_var), rtol=1e-3, atol=1e-5
        )
        # kl_u: with ep_var_mean the chained KL is sample-independent, and
        # for n_prev=0 the degenerate chained branch equals the task-0 KL
        np.testing.assert_allclose(
            float(pad.kl_u), float(base.kl_u), rtol=1e-3
        )


@pytest.mark.slow
def test_padded_grads_match_unpadded():
    params, prev, cfg, x, y = setup(2, seed=5)
    prior = default_prior(cfg.in_size)
    key = jax.random.key(1)

    def base_total(p):
        klh, klu, nll = M.loss(p, prev, prior, x, y, key, cfg)
        return klh + klu + nll

    padded, mask = M.pad_chain(prev, cfg, t_max=5)

    def pad_total(p):
        klh, klu, nll = M.loss(p, padded, prior, x, y, key, cfg, chain_mask=mask)
        return klh + klu + nll

    g1 = jax.grad(base_total)(params)
    g2 = jax.grad(pad_total)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-3, atol=1e-4)


def test_one_compile_serves_all_task_counts():
    """The padded loss must not retrace when only the mask changes."""
    params, prev2, cfg, x, y = setup(2, seed=7)
    prior = default_prior(cfg.in_size)
    key = jax.random.key(2)
    t_max = 4

    traces = {"n": 0}

    def loss_fn(p, padded, mask):
        traces["n"] += 1
        klh, klu, nll = M.loss(p, padded, prior, x, y, key, cfg, chain_mask=mask)
        return klh + klu + nll

    jitted = jax.jit(loss_fn)
    for n_prev in (0, 1, 2):
        _, prev_n, _, _, _ = setup(n_prev, seed=n_prev)
        padded, mask = M.pad_chain(prev_n, cfg, t_max=t_max)
        val = jitted(params, padded, mask)
        assert np.isfinite(float(val))
    assert traces["n"] == 1, f"retraced {traces['n']} times"
