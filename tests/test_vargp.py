"""VARGP model tests: deterministic parity with the torch reference and
internal consistency of the fused path vs the reference-style recursion."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vargp_tpu import gpmath
from vargp_tpu.kernels import RBFParams, RBFPrior, default_prior, gram, gram_diag
from vargp_tpu.models import vargp as M


def make_setup(seed=0, D=2, out=4, M0=5, M1=6, B=7, H=3):
    rng = np.random.default_rng(seed)
    f32 = np.float32
    setup = dict(
        z0=rng.standard_normal((out, M0, D)).astype(f32),
        u_mean0=rng.standard_normal((out, M0, 1)).astype(f32) * 0.5,
        u_tril_vec0=rng.standard_normal((out, (M0 * (M0 + 1)) // 2)).astype(f32) * 0.3,
        z1=rng.standard_normal((out, M1, D)).astype(f32),
        u_mean1=rng.standard_normal((out, M1, 1)).astype(f32) * 0.5,
        u_tril_vec1=rng.standard_normal((out, (M1 * (M1 + 1)) // 2)).astype(f32) * 0.3,
        log_mean=(rng.standard_normal(D + 1) * 0.2).astype(f32),
        log_logvar=(-2 * np.ones(D + 1)).astype(f32),
        x=rng.standard_normal((B, D)).astype(f32),
        y=rng.integers(0, out, size=B),
    )
    return setup


def build_jax(setup, M0, M1, out, D):
    prev = [
        M.TaskPosterior(
            z=jnp.asarray(setup["z0"]),
            u_mean=jnp.asarray(setup["u_mean0"]),
            u_tril=gpmath.vec2tril(jnp.asarray(setup["u_tril_vec0"])),
        )
    ]
    params = M.VARGPParams(
        z=jnp.asarray(setup["z1"]),
        u_mean=jnp.asarray(setup["u_mean1"]),
        u_tril_vec=jnp.asarray(setup["u_tril_vec1"]),
        kernel=RBFParams(
            log_mean=jnp.asarray(setup["log_mean"]),
            log_logvar=jnp.asarray(setup["log_logvar"]),
        ),
    )
    cfg = M.VARGPConfig(
        M=M1, out_size=out, in_size=D, n_f=10, n_var_samples=3,
        ep_var_mean=True, map_est_hypers=True,
    )
    return params, prev, cfg


class TestTorchParity:
    """Deterministic parity (map_est hypers => theta = log_mean; ep_var_mean
    => kl_u independent of the u_{<t} MC draw)."""

    @pytest.fixture()
    def oracle(self, reference_modules):
        import torch

        D, out, M0, M1 = 2, 4, 5, 6
        setup = make_setup(D=D, out=out, M0=M0, M1=M1)

        kernel = reference_modules["kernels"].RBFKernel(D, map_est=True)
        with torch.no_grad():
            kernel.log_mean.copy_(torch.tensor(setup["log_mean"]))
            kernel.log_logvar.copy_(torch.tensor(setup["log_logvar"]))
        lik = reference_modules["likelihoods"].MulticlassSoftmax(n_f=10)
        prev = [
            dict(
                z=torch.tensor(setup["z0"]),
                u_mean=torch.tensor(setup["u_mean0"]),
                u_tril_vec=torch.tensor(setup["u_tril_vec0"]),
            )
        ]
        gp = reference_modules["vargp"].VARGP(
            torch.tensor(setup["z1"]), kernel, lik, n_var_samples=3,
            ep_var_mean=True, prev_params=prev,
        )
        with torch.no_grad():
            gp.u_mean.copy_(torch.tensor(setup["u_mean1"]))
            gp.u_tril_vec.copy_(torch.tensor(setup["u_tril_vec1"]))
        return setup, gp, (D, out, M0, M1)

    @pytest.mark.slow
    def test_forward_moments_parity(self, oracle):
        import torch

        setup, gp, (D, out, M0, M1) = oracle
        with torch.no_grad():
            ref_mu, ref_var = gp(torch.tensor(setup["x"]))

        params, prev, cfg = build_jax(setup, M0, M1, out, D)
        res = M.forward(
            params, prev, default_prior(D), jnp.asarray(setup["x"]),
            jax.random.key(0), cfg, with_kl=False,
        )
        np.testing.assert_allclose(
            np.asarray(res.f_mean), ref_mu.numpy(), rtol=1e-3, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(res.f_var), ref_var.numpy(), rtol=1e-2, atol=1e-4
        )

    def test_kl_u_parity(self, oracle):
        import torch

        setup, gp, (D, out, M0, M1) = oracle
        torch.manual_seed(0)
        ref_klh, ref_klu, _ = gp.loss(
            torch.tensor(setup["x"]), torch.tensor(setup["y"])
        )

        params, prev, cfg = build_jax(setup, M0, M1, out, D)
        res = M.forward(
            params, prev, default_prior(D), jnp.asarray(setup["x"]),
            jax.random.key(0), cfg, with_kl=True,
        )
        assert float(ref_klh) == 0.0 and float(res.kl_hypers) == 0.0
        np.testing.assert_allclose(
            float(res.kl_u), float(ref_klu), rtol=1e-3
        )

    def test_task0_kl_parity(self, reference_modules):
        import torch

        D, out, M1 = 2, 3, 5
        setup = make_setup(D=D, out=out, M0=4, M1=M1)
        kernel = reference_modules["kernels"].RBFKernel(D, map_est=True)
        with torch.no_grad():
            kernel.log_mean.copy_(torch.tensor(setup["log_mean"]))
        lik = reference_modules["likelihoods"].MulticlassSoftmax(n_f=10)
        gp = reference_modules["vargp"].VARGP(
            torch.tensor(setup["z1"]), kernel, lik, n_var_samples=3,
            ep_var_mean=True, prev_params=None,
        )
        with torch.no_grad():
            gp.u_mean.copy_(torch.tensor(setup["u_mean1"]))
            gp.u_tril_vec.copy_(torch.tensor(setup["u_tril_vec1"]))
        torch.manual_seed(0)
        _, ref_klu, _ = gp.loss(torch.tensor(setup["x"]), torch.tensor(setup["y"]))

        params = M.VARGPParams(
            z=jnp.asarray(setup["z1"]),
            u_mean=jnp.asarray(setup["u_mean1"]),
            u_tril_vec=jnp.asarray(setup["u_tril_vec1"]),
            kernel=RBFParams(
                log_mean=jnp.asarray(setup["log_mean"]),
                log_logvar=jnp.asarray(setup["log_logvar"]),
            ),
        )
        cfg = M.VARGPConfig(M=M1, out_size=out, in_size=D, map_est_hypers=True)
        res = M.forward(
            params, [], default_prior(D), jnp.asarray(setup["x"]),
            jax.random.key(0), cfg, with_kl=True,
        )
        np.testing.assert_allclose(float(res.kl_u), float(ref_klu), rtol=1e-3)

    def test_nll_parity_mc(self, oracle):
        """NLL is an MC estimator; compare with a large n_f budget."""
        import torch
        from dataclasses import replace

        setup, gp, (D, out, M0, M1) = oracle
        gp.likelihood.n_f = 2000
        torch.manual_seed(0)
        *_, ref_nll = gp.loss(torch.tensor(setup["x"]), torch.tensor(setup["y"]))

        params, prev, cfg = build_jax(setup, M0, M1, out, D)
        cfg = replace(cfg, n_f=2000)
        _, _, nll = M.loss(
            params, prev, default_prior(D), jnp.asarray(setup["x"]),
            jnp.asarray(setup["y"]), jax.random.key(0), cfg,
        )
        np.testing.assert_allclose(float(nll), float(ref_nll), rtol=0.03)


@pytest.mark.slow
def test_three_task_chain_matches_reference_recursion():
    """Fused forward == reference-style linear_joint fold +
    linear_marginal_diag, with a 3-task chain and sampled (seeded) theta."""
    rng = np.random.default_rng(5)
    D, out, B, H = 3, 2, 6, 2
    sizes = [4, 3, 5]
    f32 = np.float32

    zs = [rng.standard_normal((out, m, D)).astype(f32) for m in sizes]
    u_means = [rng.standard_normal((out, m, 1)).astype(f32) * 0.4 for m in sizes]
    u_tvs = [
        rng.standard_normal((out, (m * (m + 1)) // 2)).astype(f32) * 0.3 for m in sizes
    ]
    x = rng.standard_normal((B, D)).astype(f32)
    theta = (rng.standard_normal((H, D + 1)) * 0.2).astype(f32)
    theta_j = jnp.asarray(theta)

    # --- fused path (internals of M.forward, with fixed theta) ---
    prev = [
        M.TaskPosterior(
            z=jnp.asarray(zs[i]),
            u_mean=jnp.asarray(u_means[i]),
            u_tril=gpmath.vec2tril(jnp.asarray(u_tvs[i])),
        )
        for i in range(2)
    ]
    u_tril_t = gpmath.vec2tril(jnp.asarray(u_tvs[2]))
    z_all = jnp.concatenate([p.z for p in prev] + [jnp.asarray(zs[2])], axis=-2)
    Kzz = gram(theta_j, z_all)
    L = gpmath.cholesky(Kzz)
    post = gpmath.ar_joint_posterior(
        L,
        [p.u_mean for p in prev] + [jnp.asarray(u_means[2])],
        [p.u_tril for p in prev] + [u_tril_t],
    )
    xb = jnp.broadcast_to(jnp.asarray(x)[None], (out, B, D))
    Kzx = gram(theta_j, z_all, xb)
    f_mean, f_var = gpmath.whitened_marginal_diag(
        L, post.mean, post.LS, Kzx, gram_diag(theta_j)
    )

    # --- reference-style recursion in jax ---
    mu = jnp.asarray(u_means[0])
    S = gpmath.rev_cholesky(gpmath.vec2tril(jnp.asarray(u_tvs[0])))
    z_lt = jnp.asarray(zs[0])
    for t in (1, 2):
        Kzx_t = gram(theta_j, z_lt, jnp.asarray(zs[t]))
        Kzz_t = gram(theta_j, z_lt)
        V = gpmath.rev_cholesky(gpmath.vec2tril(jnp.asarray(u_tvs[t])))
        mu, S = gpmath.linear_joint(mu, S, Kzx_t, Kzz_t, V, jnp.asarray(u_means[t]))
        z_lt = jnp.concatenate([z_lt, jnp.asarray(zs[t])], axis=-2)
    Kzz_ref = gram(theta_j, z_lt)
    Kzx_ref = gram(theta_j, z_lt, xb)
    ref_mean, ref_var = gpmath.linear_marginal_diag(
        mu, S, Kzz_ref, Kzx_ref, gram_diag(theta_j)
    )

    np.testing.assert_allclose(
        np.asarray(f_mean), np.asarray(ref_mean), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(f_var), np.asarray(ref_var), rtol=1e-2, atol=1e-4
    )


@pytest.mark.slow
def test_loss_and_grads_are_finite():
    rng = np.random.default_rng(7)
    D, out, M0, M1, B = 2, 4, 5, 6, 8
    setup = make_setup(D=D, out=out, M0=M0, M1=M1, B=B)
    params, prev, cfg = build_jax(setup, M0, M1, out, D)
    from dataclasses import replace

    cfg = replace(cfg, map_est_hypers=False, ep_var_mean=True)
    prior = default_prior(D)
    x, y = jnp.asarray(setup["x"]), jnp.asarray(setup["y"])

    def total(p):
        klh, klu, nll = M.loss(p, prev, prior, x, y, jax.random.key(1), cfg)
        return klh + klu + nll

    val, grads = jax.value_and_grad(total)(params)
    assert np.isfinite(float(val))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # no dead parameters: every gradient leaf has some signal
    assert all(float(jnp.abs(g).sum()) > 0 for g in flat)


@pytest.mark.parametrize(
    "ep_var_mean",
    [True, pytest.param(False, marks=pytest.mark.slow)],
)
def test_factored_ar_form_matches_materialized(monkeypatch, ep_var_mean):
    """Model-level A/B of VARGP_TPU_AR_FORM: the whitened factored
    posterior (production default for equal-block chains >= 768 rows;
    gate lowered here to exercise it on tiny shapes) must reproduce the
    materialized form's ELBO pieces, marginal and gradients.  Same keys →
    same eps draws; only matmul associativity differs (L^{-1} L round
    trips removed), so agreement is f32-tight."""
    from dataclasses import replace

    rng = np.random.default_rng(21)
    D, out, Mb, B = 2, 4, 6, 8
    setup = make_setup(seed=21, D=D, out=out, M0=Mb, M1=Mb, B=B)
    params, prev, cfg = build_jax(setup, Mb, Mb, out, D)
    # three-task equal-block chain: prev x2 + current
    prev = prev + [
        M.TaskPosterior(
            z=jnp.asarray(rng.standard_normal((out, Mb, D)).astype(np.float32)),
            u_mean=jnp.asarray(
                rng.standard_normal((out, Mb, 1)).astype(np.float32) * 0.5
            ),
            u_tril=gpmath.vec2tril(
                jnp.asarray(
                    rng.standard_normal((out, (Mb * (Mb + 1)) // 2)).astype(
                        np.float32
                    )
                    * 0.3
                )
            ),
        )
    ]
    cfg = replace(cfg, map_est_hypers=False, ep_var_mean=ep_var_mean)
    prior = default_prior(D)
    x, y = jnp.asarray(setup["x"]), jnp.asarray(setup["y"])
    monkeypatch.setattr(M, "_FAST_CHAIN_MIN_ROWS", 1)

    def pieces(p):
        klh, klu, nll = M.loss(p, prev, prior, x, y, jax.random.key(3), cfg)
        return klh + klu + nll, (klh, klu, nll)

    out_forms = {}
    for form in ("materialized", "factored"):
        monkeypatch.setenv("VARGP_TPU_AR_FORM", form)
        (total, aux), grads = jax.value_and_grad(pieces, has_aux=True)(params)
        probs = M.predict(params, prev, x, jax.random.key(5), cfg)
        out_forms[form] = (total, aux, grads, probs)

    t1, a1, g1, p1 = out_forms["materialized"]
    t2, a2, g2, p2 = out_forms["factored"]
    np.testing.assert_allclose(float(t1), float(t2), rtol=1e-4)
    for u, v in zip(a1, a2):
        np.testing.assert_allclose(float(u), float(v), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-3, atol=1e-5)
    # grads: the MC-amplified z cotangents tolerate ~1e-2 relative (one
    # L^{-1} L round trip removed re-associates the sampled-KL maha term)
    for u, v in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(u), np.asarray(v), rtol=1.5e-2, atol=1e-4
        )


def test_predict_probabilities():
    setup = make_setup()
    params, prev, cfg = build_jax(setup, 5, 6, 4, 2)
    probs = M.predict(params, prev, jnp.asarray(setup["x"]), jax.random.key(0), cfg)
    p = np.asarray(probs)
    assert p.shape == (7, 4)
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-4)
    assert (p >= 0).all()


@pytest.mark.slow
def test_cross_gram_matches_broadcast_gram():
    """cross_gram (shared-x formulation + hand VJP) must match the generic
    gram on broadcast x in values AND gradients wrt z/theta."""
    import numpy as np

    from vargp_tpu.kernels import cross_gram, gram

    rng = np.random.default_rng(3)
    H, O, M, B, D = 2, 3, 5, 7, 4
    theta = jnp.asarray(rng.standard_normal((H, D + 1)).astype(np.float32) * 0.3)
    z = jnp.asarray(rng.standard_normal((O, M, D)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))

    xb = jnp.broadcast_to(x[None], (O, B, D))
    ref = gram(theta, z, xb)
    got = cross_gram(theta, z, x)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def loss_ref(theta, z):
        return jnp.sum(jnp.sin(gram(theta, z, xb)))

    def loss_got(theta, z):
        return jnp.sum(jnp.sin(cross_gram(theta, z, x)))

    gt_r, gz_r = jax.grad(loss_ref, argnums=(0, 1))(theta, z)
    gt_g, gz_g = jax.grad(loss_got, argnums=(0, 1))(theta, z)
    np.testing.assert_allclose(gz_g, gz_r, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(gt_g, gt_r, rtol=1e-4, atol=1e-5)


def test_select_inducing_small_dataset_upsamples():
    """M > n_rows (scaled configs, e.g. M=1024 on Split-Digits) must draw
    rows WITH replacement, not silently truncate to n_rows — a short z
    breaks every padded-chain shape downstream (r5 scaled-mint crash)."""
    key = jax.random.key(0)
    data = jnp.arange(7 * 3, dtype=jnp.float32).reshape(7, 3)
    z = M.select_inducing(key, data, M=16, out_size=4)
    assert z.shape == (4, 16, 3)
    # every z row is an actual data row
    d = jnp.abs(z[:, :, None, :] - data[None, None, :, :]).sum(-1).min(-1)
    assert float(d.max()) == 0.0
    # the large-dataset path is unchanged: a permutation, no duplicates
    z2 = M.select_inducing(key, data, M=7, out_size=2)
    assert z2.shape == (2, 7, 3)
    for o in range(2):
        assert np.unique(np.asarray(z2[o]), axis=0).shape[0] == 7
