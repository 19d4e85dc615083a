"""L0 math tests: closed forms, round-trips, and parity vs the torch oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vargp_tpu import gpmath
from vargp_tpu.gpmath.tril import identity_trilvec


def rand_spd(rng, *batch, n):
    A = rng.standard_normal((*batch, n, n)).astype(np.float32)
    return A @ np.swapaxes(A, -1, -2) + n * np.eye(n, dtype=np.float32)


def test_vec2tril_roundtrip():
    rng = np.random.default_rng(0)
    m = 7
    vec = rng.standard_normal((3, (m * (m + 1)) // 2)).astype(np.float32)
    tril = gpmath.vec2tril(jnp.asarray(vec))
    assert tril.shape == (3, m, m)
    # strictly lower triangle survives the round trip; diagonal is softplus'd
    back = gpmath.mat2trilvec(tril)
    rows, cols = np.tril_indices(m)
    off = rows != cols
    np.testing.assert_allclose(np.asarray(back)[:, off], vec[:, off], rtol=1e-6)
    diag = np.asarray(jnp.diagonal(tril, axis1=-2, axis2=-1))
    assert (diag > 0).all()
    np.testing.assert_allclose(
        diag, np.log1p(np.exp(vec[:, ~off])), rtol=1e-5
    )


def test_identity_trilvec_unpacks_to_identity():
    v = identity_trilvec(2, 5)
    L = gpmath.vec2tril(v)
    np.testing.assert_allclose(
        np.asarray(L), np.broadcast_to(np.eye(5, dtype=np.float32), (2, 5, 5)),
        atol=1e-6,
    )


def test_cholesky_and_solves():
    rng = np.random.default_rng(1)
    K = rand_spd(rng, 4, n=6)
    L = gpmath.cholesky(jnp.asarray(K), eps=0.0)
    np.testing.assert_allclose(
        np.asarray(gpmath.rev_cholesky(L)), K, rtol=1e-4, atol=1e-4
    )
    B = rng.standard_normal((4, 6, 3)).astype(np.float32)
    X = gpmath.tri_solve(L, jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(L @ X), B, rtol=1e-4, atol=1e-4)
    Y = gpmath.chol_solve(L, jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(K @ Y), B, rtol=1e-3, atol=1e-3)


def test_mvn_kl_matches_naive():
    rng = np.random.default_rng(2)
    k = 5
    Sq = rand_spd(rng, n=k)
    Sp = rand_spd(rng, n=k)
    mq = rng.standard_normal(k).astype(np.float32)
    mp = rng.standard_normal(k).astype(np.float32)

    Lq = np.linalg.cholesky(Sq)
    Lp = np.linalg.cholesky(Sp)
    kl = gpmath.mvn_kl(jnp.asarray(mq), jnp.asarray(Lq), jnp.asarray(mp), jnp.asarray(Lp))

    Sp_inv = np.linalg.inv(Sp)
    naive = 0.5 * (
        np.trace(Sp_inv @ Sq)
        + (mp - mq) @ Sp_inv @ (mp - mq)
        - k
        + np.log(np.linalg.det(Sp) / np.linalg.det(Sq))
    )
    np.testing.assert_allclose(float(kl), naive, rtol=1e-4)


def test_mvn_log_prob_matches_scipy_style():
    rng = np.random.default_rng(3)
    k = 4
    S = rand_spd(rng, n=k)
    mu = rng.standard_normal(k).astype(np.float32)
    x = rng.standard_normal(k).astype(np.float32)
    L = np.linalg.cholesky(S)
    lp = gpmath.mvn_log_prob(jnp.asarray(x), jnp.asarray(mu), jnp.asarray(L))
    diff = x - mu
    naive = (
        -0.5 * (k * np.log(2 * np.pi) + diff @ np.linalg.inv(S) @ diff)
        - 0.5 * np.log(np.linalg.det(S))
    )
    np.testing.assert_allclose(float(lp), naive, rtol=1e-4)


def test_mvn_sample_moments():
    rng = np.random.default_rng(4)
    k = 3
    S = rand_spd(rng, n=k)
    mu = rng.standard_normal(k).astype(np.float32)
    L = np.linalg.cholesky(S).astype(np.float32)
    samples = gpmath.mvn_sample(
        jax.random.key(0), jnp.asarray(mu), jnp.asarray(L), sample_shape=(60000,)
    )
    emp_mu = np.asarray(samples).mean(0)
    emp_cov = np.cov(np.asarray(samples).T)
    np.testing.assert_allclose(emp_mu, mu, atol=0.04)
    np.testing.assert_allclose(emp_cov, S, rtol=0.08, atol=0.08)


def test_gp_cond_vs_naive_inverse():
    rng = np.random.default_rng(5)
    M, N = 6, 4
    Kzz = rand_spd(rng, n=M)
    Kzx = rng.standard_normal((M, N)).astype(np.float32)
    Kxx = rand_spd(rng, n=N)
    u = rng.standard_normal((M, 1)).astype(np.float32)

    mu, Sigma = gpmath.gp_cond(
        jnp.asarray(u), jnp.asarray(Kzz), jnp.asarray(Kzx), jnp.asarray(Kxx)
    )
    Kinv = np.linalg.inv(Kzz + 1e-4 * np.eye(M))
    mu_naive = Kzx.T @ Kinv @ u
    Sig_naive = Kxx - Kzx.T @ Kinv @ Kzx
    np.testing.assert_allclose(np.asarray(mu), mu_naive, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(Sigma), Sig_naive, rtol=1e-3, atol=1e-3)


def test_linear_joint_vs_naive():
    rng = np.random.default_rng(6)
    M, N = 5, 3
    m = rng.standard_normal((M, 1)).astype(np.float32)
    S = rand_spd(rng, n=M)
    Kzz = rand_spd(rng, n=M)
    Kzx = rng.standard_normal((M, N)).astype(np.float32)
    V = rand_spd(rng, n=N)
    b = rng.standard_normal((N, 1)).astype(np.float32)

    mu, Sigma = gpmath.linear_joint(
        *(jnp.asarray(a) for a in (m, S, Kzx, Kzz, V, b))
    )
    A = Kzx.T @ np.linalg.inv(Kzz + 1e-4 * np.eye(M))
    mu_naive = np.concatenate([m, A @ m + b], axis=0)
    Sig_naive = np.block([[S, S @ A.T], [A @ S, V + A @ S @ A.T]])
    np.testing.assert_allclose(np.asarray(mu), mu_naive, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(Sigma), Sig_naive, rtol=1e-3, atol=2e-3)


def test_ar_joint_posterior_matches_linear_joint_fold():
    """The fused one-Cholesky AR chain must reproduce the reference-style
    linear_joint recursion exactly (same jitter semantics)."""
    rng = np.random.default_rng(7)
    sizes = [4, 3, 5]
    D = 2
    # joint Gram over stacked inducing points via an RBF-like PSD construction
    Z = rng.standard_normal((sum(sizes), D)).astype(np.float32)
    sq = ((Z[:, None] - Z[None, :]) ** 2).sum(-1)
    K = np.exp(-0.5 * sq).astype(np.float32)

    u_means = [rng.standard_normal((s, 1)).astype(np.float32) for s in sizes]
    u_trils = [
        np.linalg.cholesky(rand_spd(rng, n=s)).astype(np.float32) for s in sizes
    ]

    L_full = gpmath.cholesky(jnp.asarray(K))
    post = gpmath.ar_joint_posterior(
        L_full, [jnp.asarray(u) for u in u_means], [jnp.asarray(t) for t in u_trils]
    )

    # fold with reference-style linear_joint
    c = sizes[0]
    mu = jnp.asarray(u_means[0])
    S = gpmath.rev_cholesky(jnp.asarray(u_trils[0]))
    for t in range(1, len(sizes)):
        Mt = sizes[t]
        Kzz = jnp.asarray(K[:c, :c])
        Kzx = jnp.asarray(K[:c, c : c + Mt])
        V = gpmath.rev_cholesky(jnp.asarray(u_trils[t]))
        b = jnp.asarray(u_means[t])
        mu, S = gpmath.linear_joint(mu, S, Kzx, Kzz, V, b)
        c += Mt

    np.testing.assert_allclose(
        np.asarray(post.mean), np.asarray(mu), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(gpmath.rev_cholesky(post.LS)), np.asarray(S), rtol=1e-3, atol=1e-3
    )


def test_whitened_marginal_diag_matches_linear_marginal_diag():
    rng = np.random.default_rng(8)
    M, B = 6, 10
    K = rand_spd(rng, n=M)
    m = rng.standard_normal((M, 1)).astype(np.float32)
    LS = np.linalg.cholesky(rand_spd(rng, n=M)).astype(np.float32)
    Kzx = rng.standard_normal((M, B)).astype(np.float32)
    kxx = np.abs(rng.standard_normal(B)).astype(np.float32) + 1.0

    L = gpmath.cholesky(jnp.asarray(K))
    f_mu, f_var = gpmath.whitened_marginal_diag(
        L, jnp.asarray(m), jnp.asarray(LS), jnp.asarray(Kzx), jnp.asarray(kxx)
    )
    ref_mu, ref_var = gpmath.linear_marginal_diag(
        jnp.asarray(m),
        gpmath.rev_cholesky(jnp.asarray(LS)),
        jnp.asarray(K),
        jnp.asarray(Kzx),
        jnp.asarray(kxx),
    )
    np.testing.assert_allclose(np.asarray(f_mu), np.asarray(ref_mu), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(f_var), np.asarray(ref_var), rtol=1e-2, atol=1e-3)


def test_tri_half_split_gating():
    from vargp_tpu.gpmath.linalg import tri_half_split

    assert tri_half_split(300) is None
    assert tri_half_split(511) is None
    assert tri_half_split(512) == 256 or tri_half_split(512) == 128
    assert tri_half_split(1024) == 512
    assert tri_half_split(1000) == 512


def test_mvn_kl_tri_skip_matches_solve_path_at_scale():
    """k >= 512 triggers the block-triangular trace: must match the
    tri_solve path (no Lp_inv) within f32 tolerance, including gradients
    through both Ls."""
    rng = np.random.default_rng(29)
    k = 512
    mq = rng.standard_normal((2, k)).astype(np.float32)
    mp = rng.standard_normal((2, k)).astype(np.float32)
    Lq = np.linalg.cholesky(rand_spd(rng, 2, n=k)).astype(np.float32)
    Lp = np.linalg.cholesky(rand_spd(rng, 2, n=k)).astype(np.float32)
    Lp_inv = gpmath.tri_inv(jnp.asarray(Lp))

    def f(Lq_, inv):
        return jnp.sum(
            gpmath.mvn_kl(
                jnp.asarray(mq), Lq_, jnp.asarray(mp), jnp.asarray(Lp),
                Lp_inv=inv,
            )
        )

    v_skip, g_skip = jax.value_and_grad(f)(jnp.asarray(Lq), Lp_inv)
    v_ref, g_ref = jax.value_and_grad(f)(jnp.asarray(Lq), None)
    np.testing.assert_allclose(float(v_skip), float(v_ref), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(g_skip), np.asarray(g_ref), rtol=5e-3, atol=5e-3
    )


def test_whitened_marginal_diag_tri_skip_at_scale():
    """M >= 512 triggers the blocked LLS/C contraction in the L_inv
    branch: values must match the tri_solve branch."""
    rng = np.random.default_rng(31)
    M, B = 512, 16
    K = rand_spd(rng, n=M)
    m = rng.standard_normal((M, 1)).astype(np.float32)
    LS = np.linalg.cholesky(rand_spd(rng, n=M)).astype(np.float32)
    Kzx = rng.standard_normal((M, B)).astype(np.float32)
    kxx = (np.abs(rng.standard_normal(B)) + float(M)).astype(np.float32)

    L = gpmath.cholesky(jnp.asarray(K))
    Li = gpmath.tri_inv(L)
    mu_skip, var_skip = gpmath.whitened_marginal_diag(
        L, jnp.asarray(m), jnp.asarray(LS), jnp.asarray(Kzx), jnp.asarray(kxx),
        L_inv=Li,
    )
    mu_ref, var_ref = gpmath.whitened_marginal_diag(
        L, jnp.asarray(m), jnp.asarray(LS), jnp.asarray(Kzx), jnp.asarray(kxx)
    )
    np.testing.assert_allclose(
        np.asarray(mu_skip), np.asarray(mu_ref), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(var_skip), np.asarray(var_ref), rtol=1e-2, atol=1e-2
    )


class TestTorchOracle:
    """Bit-level-ish parity with the reference implementation."""

    def test_vec2tril_parity(self, reference_modules):
        import torch

        rng = np.random.default_rng(10)
        m = 6
        vec = rng.standard_normal((2, (m * (m + 1)) // 2)).astype(np.float32)
        ours = np.asarray(gpmath.vec2tril(jnp.asarray(vec)))
        theirs = reference_modules["gp_utils"].vec2tril(torch.tensor(vec)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)

    def test_linear_joint_parity(self, reference_modules):
        import torch

        rng = np.random.default_rng(11)
        M, N = 5, 4
        m = rng.standard_normal((M, 1)).astype(np.float32)
        S = rand_spd(rng, n=M)
        Kzz = rand_spd(rng, n=M)
        Kzx = rng.standard_normal((M, N)).astype(np.float32)
        V = rand_spd(rng, n=N)
        b = rng.standard_normal((N, 1)).astype(np.float32)

        mu, Sig = gpmath.linear_joint(*(jnp.asarray(a) for a in (m, S, Kzx, Kzz, V, b)))
        t = lambda a: torch.tensor(a)
        ref_mu, ref_sig = reference_modules["gp_utils"].linear_joint(
            t(m), t(S), t(Kzx), t(Kzz), t(V), t(b)
        )
        np.testing.assert_allclose(np.asarray(mu), ref_mu.numpy(), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(Sig), ref_sig.numpy(), rtol=1e-3, atol=1e-3)

    def test_linear_marginal_diag_parity(self, reference_modules):
        import torch

        rng = np.random.default_rng(12)
        M, B = 6, 8
        m = rng.standard_normal((M, 1)).astype(np.float32)
        S = rand_spd(rng, n=M)
        Kzz = rand_spd(rng, n=M)
        Kzx = rng.standard_normal((M, B)).astype(np.float32)
        kxx = (np.abs(rng.standard_normal((1, B))) + 1).astype(np.float32)

        mu, var = gpmath.linear_marginal_diag(
            jnp.asarray(m), jnp.asarray(S), jnp.asarray(Kzz), jnp.asarray(Kzx), jnp.asarray(kxx)
        )
        t = lambda a: torch.tensor(a)
        ref_mu, ref_var = reference_modules["gp_utils"].linear_marginal_diag(
            t(m), t(S), t(Kzz), t(Kzx), t(kxx)
        )
        np.testing.assert_allclose(np.asarray(mu), ref_mu.numpy(), rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(var), ref_var.numpy(), rtol=1e-2, atol=1e-3)


@pytest.mark.slow
def test_tri_inv_matches_solve():
    rng = np.random.default_rng(20)
    for n in (5, 64, 200, 300):
        K = rand_spd(rng, 3, n=n)
        L = np.linalg.cholesky(K).astype(np.float32)
        Linv = np.asarray(gpmath.tri_inv(jnp.asarray(L)))
        np.testing.assert_allclose(
            Linv @ L, np.broadcast_to(np.eye(n, dtype=np.float32), (3, n, n)),
            atol=5e-3,
        )
        # lower-triangularity preserved
        assert np.allclose(np.triu(Linv, 1), 0.0, atol=1e-6)


def test_ar_joint_posterior_fast_matches_fold():
    """The closed-form block-LDL construction == the sequential fold."""
    rng = np.random.default_rng(9)
    sizes = [4, 3, 5]
    Z = rng.standard_normal((sum(sizes), 2)).astype(np.float32)
    sq = ((Z[:, None] - Z[None, :]) ** 2).sum(-1)
    K = np.exp(-0.5 * sq).astype(np.float32)
    u_means = [rng.standard_normal((s, 1)).astype(np.float32) for s in sizes]
    u_trils = [
        np.linalg.cholesky(rand_spd(rng, n=s)).astype(np.float32) for s in sizes
    ]
    L = gpmath.cholesky(jnp.asarray(K))
    Li = gpmath.tri_inv(L)
    ref = gpmath.ar_joint_posterior(
        L, [jnp.asarray(u) for u in u_means], [jnp.asarray(t) for t in u_trils]
    )
    fast = gpmath.ar_joint_posterior_fast(
        L, Li, [jnp.asarray(u) for u in u_means], [jnp.asarray(t) for t in u_trils]
    )
    np.testing.assert_allclose(
        np.asarray(fast.mean), np.asarray(ref.mean), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(fast.LS), np.asarray(ref.LS), rtol=1e-3, atol=1e-4
    )


def test_ar_joint_posterior_fast_single_block_is_exact_identity():
    """T == 1: the fold is the identity (G = L L^{-1} = I), so the fast
    path must return u_mean/u_tril EXACTLY (no L-dependent rounding) —
    this is also the M=1024 single-task hot path (flops_audit: the
    identity round-trip was ~25% of that step's matmul FLOPs)."""
    rng = np.random.default_rng(13)
    M = 6
    K = rand_spd(rng, n=M).astype(np.float32)
    u_mean = rng.standard_normal((M, 1)).astype(np.float32)
    u_tril = np.linalg.cholesky(rand_spd(rng, n=M)).astype(np.float32)
    L = gpmath.cholesky(jnp.asarray(K))
    Li = gpmath.tri_inv(L)
    fast = gpmath.ar_joint_posterior_fast(
        L, Li, [jnp.asarray(u_mean)], [jnp.asarray(u_tril)]
    )
    np.testing.assert_array_equal(np.asarray(fast.mean), u_mean)
    np.testing.assert_array_equal(np.asarray(fast.LS), u_tril)


def test_ar_joint_posterior_factored_matches_fast():
    """Whitened factored form: mean identical path, and the materialized
    scale factor L @ blockdiag(w) must equal the fast path's LS.  The
    factored marginal must match the materialized whitened marginal."""
    rng = np.random.default_rng(17)
    M, T, B = 4, 3, 7
    S = M * T
    Z = rng.standard_normal((S, 2)).astype(np.float32)
    sq = ((Z[:, None] - Z[None, :]) ** 2).sum(-1)
    K = np.exp(-0.5 * sq).astype(np.float32) + 0.1 * np.eye(S, dtype=np.float32)
    u_means = [rng.standard_normal((M, 1)).astype(np.float32) for _ in range(T)]
    u_trils = [
        np.linalg.cholesky(rand_spd(rng, n=M)).astype(np.float32)
        for _ in range(T)
    ]
    L = gpmath.cholesky(jnp.asarray(K))
    Li = gpmath.tri_inv(L)
    ums = [jnp.asarray(u) for u in u_means]
    uts = [jnp.asarray(t) for t in u_trils]

    fast = gpmath.ar_joint_posterior_fast(L, Li, ums, uts)
    fac = gpmath.ar_joint_posterior_factored(L, Li, ums, uts)

    assert fac.w.shape == (T, M, M)
    # the factored mean is WHITENED: L @ v == the fast path's mean
    np.testing.assert_allclose(
        np.asarray(gpmath.mm(L, fac.v)),
        np.asarray(fast.mean), rtol=1e-4, atol=1e-5,
    )
    # L @ blockdiag(w) == LS (the representation identity)
    bd = np.zeros((S, S), np.float32)
    for t in range(T):
        bd[t * M : (t + 1) * M, t * M : (t + 1) * M] = np.asarray(fac.w)[t]
    np.testing.assert_allclose(
        np.asarray(L) @ bd, np.asarray(fast.LS), rtol=1e-3, atol=1e-4
    )

    # factored marginal == materialized whitened marginal
    Kzx = jnp.asarray(rng.standard_normal((S, B)).astype(np.float32))
    kxx = jnp.asarray(np.abs(rng.standard_normal(B)).astype(np.float32) + 1.0)
    mu1, var1 = gpmath.whitened_marginal_diag(
        L, fast.mean, fast.LS, Kzx, kxx, L_inv=Li
    )
    mu2, var2 = gpmath.whitened_marginal_diag_factored(
        Li, fac.v, fac.w, Kzx, kxx
    )
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(var1), np.asarray(var2), rtol=1e-2, atol=1e-4)


def test_ar_joint_posterior_factored_batched_grads():
    """Batched (hyper, class) leading dims + gradient flow through the
    factored construction and marginal (the train-step contract)."""
    rng = np.random.default_rng(19)
    H, O, M, T, B = 2, 3, 4, 2, 5
    S = M * T
    A = rng.standard_normal((H, O, S, S)).astype(np.float32)
    K = A @ np.swapaxes(A, -1, -2) + S * np.eye(S, dtype=np.float32)
    u_means = [rng.standard_normal((O, M, 1)).astype(np.float32) for _ in range(T)]
    u_trils = [
        np.stack([np.linalg.cholesky(rand_spd(rng, n=M)) for _ in range(O)])
        .astype(np.float32)
        for _ in range(T)
    ]
    Kzx = jnp.asarray(rng.standard_normal((H, O, S, B)).astype(np.float32))
    kxx = jnp.asarray(np.ones((H, 1, 1), np.float32))

    def f(K, ums, uts):
        L = gpmath.cholesky(K)
        Li = gpmath.tri_inv(L)
        fac = gpmath.ar_joint_posterior_factored(L, Li, ums, uts)
        mu, var = gpmath.whitened_marginal_diag_factored(
            Li, fac.v, fac.w, Kzx, kxx
        )
        return jnp.sum(mu) + jnp.sum(var)

    ums = [jnp.asarray(u) for u in u_means]
    uts = [jnp.asarray(t) for t in u_trils]
    val, grads = jax.value_and_grad(f, argnums=(0, 1, 2))(jnp.asarray(K), ums, uts)
    assert np.isfinite(float(val))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))

    # cross-check against the materialized form end to end
    def g(K, ums, uts):
        L = gpmath.cholesky(K)
        Li = gpmath.tri_inv(L)
        fast = gpmath.ar_joint_posterior_fast(L, Li, ums, uts)
        mu, var = gpmath.whitened_marginal_diag(
            L, fast.mean, fast.LS, Kzx, kxx, L_inv=Li
        )
        return jnp.sum(mu) + jnp.sum(var)

    np.testing.assert_allclose(
        float(val), float(g(jnp.asarray(K), ums, uts)), rtol=1e-3
    )


@pytest.mark.slow
def test_chol_and_inv_blocked_matches_monolithic():
    rng = np.random.default_rng(11)
    from vargp_tpu.gpmath.linalg import chol_and_inv_blocked

    for T, m in ((1, 7), (3, 5), (5, 4)):
        S = T * m
        K = rand_spd(rng, 2, n=S)
        L, Linv = chol_and_inv_blocked(jnp.asarray(K), m)
        expect = np.linalg.cholesky(K)
        np.testing.assert_allclose(np.asarray(L), expect, rtol=2e-3, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(Linv) @ expect,
            np.broadcast_to(np.eye(S, dtype=np.float32), (2, S, S)),
            atol=5e-3,
        )


def test_chol_and_inv_dispatch_general_shapes():
    """The shape-driven dispatch rule (ops.dispatch._pick_block) must give
    exact (L, L^{-1}) for chains whose sum(M) is NOT a multiple of 100 —
    divisor-blocked (250=2x125, 640=5x128) and identity-pad-fallback
    (455 -> 512=4x128, 12.5% waste) paths alike."""
    from vargp_tpu.ops.dispatch import _pick_block, chol_and_inv

    assert _pick_block(300) == 100
    assert _pick_block(250) == 125
    assert _pick_block(400) == 100
    assert _pick_block(640) == 128
    assert _pick_block(1000) == 125
    assert _pick_block(455) is None  # falls back to identity-pad

    rng = np.random.default_rng(17)
    for S in (250, 455):
        K = rand_spd(rng, 2, n=S)
        L, Linv = chol_and_inv(jnp.asarray(K))
        expect = np.linalg.cholesky(K)
        np.testing.assert_allclose(np.asarray(L), expect, rtol=2e-3, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(Linv) @ expect,
            np.broadcast_to(np.eye(S, dtype=np.float32), (2, S, S)),
            atol=5e-3,
        )


def test_chol_and_inv_tri_bwd_matches_dense(monkeypatch):
    """The triangular-skip backward (VARGP_TPU_TRI_BWD=1) must reproduce
    the dense rule's K-gradient, including with DENSE (L, L^{-1})
    cotangents (consumers like mvn_sample's einsum emit them; the
    structural tril-read argument says their upper parts are ignored —
    verify that holds through the block decomposition)."""
    from vargp_tpu.ops.dispatch import _tri_bwd_split, chol_and_inv

    assert _tri_bwd_split(511) is None  # too small / env off
    monkeypatch.setenv("VARGP_TPU_TRI_BWD", "1")
    assert _tri_bwd_split(1024) == 512
    assert _tri_bwd_split(1000) == 512
    assert _tri_bwd_split(511) is None

    rng = np.random.default_rng(23)
    S = 512
    K = rand_spd(rng, 2, n=S)
    C1 = rng.standard_normal((2, S, S)).astype(np.float32)  # dense cotangents
    C2 = rng.standard_normal((2, S, S)).astype(np.float32)

    def loss(K_):
        L, Linv = chol_and_inv(K_)
        return jnp.sum(L * C1) + jnp.sum(Linv * C2)

    monkeypatch.setenv("VARGP_TPU_TRI_BWD", "0")
    g_dense = jax.grad(lambda K_: loss(K_))(jnp.asarray(K))
    monkeypatch.setenv("VARGP_TPU_TRI_BWD", "1")
    g_tri = jax.grad(lambda K_: loss(K_))(jnp.asarray(K))
    np.testing.assert_allclose(
        np.asarray(g_tri), np.asarray(g_dense), rtol=2e-4, atol=2e-4
    )


def test_mixed_precision_matmul_vjps():
    """mm/mtm/mmt (f32 fwd, bf16x3 bwd) must match plain einsum values AND
    gradients exactly on CPU (precision hints are TPU-only)."""
    from vargp_tpu.gpmath.linalg import mm, mtm, mmt

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((2, 5, 4)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((2, 4, 3)).astype(np.float32))

    cases = [
        (mm, a, b, "...ij,...jk->...ik"),
        (mtm, jnp.swapaxes(a, -1, -2), b, "...ji,...jk->...ik"),
        (mmt, a, jnp.swapaxes(b, -1, -2), "...ij,...kj->...ik"),
    ]
    for fn, x, y, pat in cases:
        ref = jnp.einsum(pat, x, y)
        np.testing.assert_allclose(fn(x, y), ref, rtol=1e-6)

        def loss_fn(x, y, fn=fn):
            return jnp.sum(jnp.sin(fn(x, y)))

        def loss_ref(x, y, pat=pat):
            return jnp.sum(jnp.sin(jnp.einsum(pat, x, y)))

        gx, gy = jax.grad(loss_fn, argnums=(0, 1))(x, y)
        rx, ry = jax.grad(loss_ref, argnums=(0, 1))(x, y)
        np.testing.assert_allclose(gx, rx, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(gy, ry, rtol=1e-5, atol=1e-6)


def test_mixed_precision_matmul_broadcast_grads():
    """Broadcast batch dims must sum correctly in the custom backward."""
    from vargp_tpu.gpmath.linalg import mm

    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((5, 4)).astype(np.float32))  # broadcast
    b = jnp.asarray(rng.standard_normal((3, 2, 4, 3)).astype(np.float32))

    def loss_fn(a, b):
        return jnp.sum(mm(a, b) ** 2)

    def loss_ref(a, b):
        return jnp.sum(jnp.einsum("...ij,...jk->...ik", a, b) ** 2)

    ga, gb = jax.grad(loss_fn, argnums=(0, 1))(a, b)
    ra, rb = jax.grad(loss_ref, argnums=(0, 1))(a, b)
    assert ga.shape == a.shape and gb.shape == b.shape
    np.testing.assert_allclose(ga, ra, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(gb, rb, rtol=1e-5, atol=1e-6)


def test_vec2tril_custom_vjp_matches_ad():
    """The hand-written vec2tril backward (reverse gather + softplus chain)
    must match autodiff through the reference construction."""
    from vargp_tpu.gpmath.tril import _vec2tril_impl, tril_size, vec2tril

    rng = np.random.default_rng(5)
    m = 6
    vec = jnp.asarray(rng.standard_normal((3, tril_size(m))).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, m, m)).astype(np.float32))
    g1 = jax.grad(lambda v: jnp.sum(vec2tril(v, m) * w))(vec)
    g2 = jax.grad(lambda v: jnp.sum(_vec2tril_impl(m, v) * w))(vec)
    np.testing.assert_allclose(g1, g2, rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_vec2tril_vjp_large_m():
    """Scale-path regression guard: the hand VJP must stay exact at the
    M=256 packed size (the M=1024 production shape is CPU-prohibitive)."""
    from vargp_tpu.gpmath.tril import _vec2tril_impl, tril_size, vec2tril

    rng = np.random.default_rng(7)
    m = 256
    vec = jnp.asarray(rng.standard_normal((2, tril_size(m))).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((2, m, m)).astype(np.float32))
    g1 = jax.grad(lambda v: jnp.sum(vec2tril(v, m) * w))(vec)
    g2 = jax.grad(lambda v: jnp.sum(_vec2tril_impl(m, v) * w))(vec)
    np.testing.assert_allclose(g1, g2, rtol=1e-6, atol=1e-6)


def test_filled_layout_bit_exact_and_gather_free():
    """The fill_triangular packing (gpmath.tril filled layout) must be
    BIT-exact against vec2tril — forward values and backward cotangents —
    and its fwd+bwd jaxpr must contain no gather/scatter (the whole point:
    the row-major unpack gather + pack scatter are 14 ms/step at M=1024
    on v5e)."""
    from vargp_tpu.gpmath.tril import (
        filled_perm,
        filled_to_rowmajor,
        rowmajor_to_filled,
        tril_from_filled,
        tril_size,
        vec2tril,
    )

    for m in (1, 2, 3, 5, 8, 60, 100):
        p = filled_perm(m)
        assert sorted(p.tolist()) == list(range(tril_size(m)))
        rng = np.random.default_rng(m)
        v = jnp.asarray(
            rng.standard_normal((2, tril_size(m))).astype(np.float32)
        )
        c = jnp.asarray(rng.standard_normal((2, m, m)).astype(np.float32))
        vf = rowmajor_to_filled(v, m)
        assert np.array_equal(np.asarray(filled_to_rowmajor(vf, m)), v)

        f1, g1 = jax.value_and_grad(lambda a: jnp.sum(vec2tril(a, m) * c))(v)
        f2, g2 = jax.value_and_grad(
            lambda a: jnp.sum(tril_from_filled(a, m) * c)
        )(vf)
        assert float(f1) == float(f2)
        assert np.array_equal(np.asarray(filled_to_rowmajor(g2, m)), np.asarray(g1))

    # gather-freeness, checked on the full flattened fwd+bwd program
    m = 60
    vf = jnp.zeros((2, tril_size(m)))
    c = jnp.ones((2, m, m))
    jx = jax.make_jaxpr(
        jax.value_and_grad(lambda a: jnp.sum(tril_from_filled(a, m) * c))
    )(vf)
    def all_prims(jaxpr, acc):
        for eq in jaxpr.eqns:
            acc.add(eq.primitive.name)
            for val in eq.params.values():
                if hasattr(val, "jaxpr"):
                    all_prims(val.jaxpr, acc)
                elif isinstance(val, (list, tuple)):
                    for vi in val:
                        if hasattr(vi, "jaxpr"):
                            all_prims(vi.jaxpr, acc)
        return acc

    prims = all_prims(jx.jaxpr, set())
    assert not prims & {"gather", "scatter", "scatter-add", "scatter_add"}, prims


def test_vec2tril_rejects_mismatched_m():
    """An explicit m that mismatches the packed length must raise: the
    unpack gather would otherwise clamp OOB indices and return a silently
    corrupted factor (checkpoint trained at a different M, cfg.M typo)."""
    vec = jnp.arange(1.0, 7.0)  # packed length 6 == m=3
    gpmath.vec2tril(vec, 3)  # matching m is fine
    for fn in (
        gpmath.vec2tril,
        gpmath.tril.rowmajor_to_filled,
        gpmath.tril.filled_to_rowmajor,
        gpmath.tril.tril_from_filled,
    ):
        with pytest.raises(ValueError, match="packed length"):
            fn(vec, 4)


def test_ar_joint_posterior_factored_heterogeneous_batch():
    """The factored (default) form must accept the same heterogeneous
    per-task batch dims the fast/materialized forms accept — e.g. a chain
    mixing (O, M, 1) and (1, M, 1) means."""
    rng = np.random.default_rng(3)
    M, T, O = 4, 2, 3
    S = M * T
    K = rand_spd(rng, n=S) + 0.1 * np.eye(S, dtype=np.float32)
    L = gpmath.cholesky(jnp.asarray(K[None]).repeat(O, 0))  # (O, S, S)
    Li = gpmath.tri_inv(L)
    ums = [
        jnp.asarray(rng.standard_normal((O, M, 1)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((1, M, 1)).astype(np.float32)),
    ]
    uts = [
        jnp.asarray(
            np.linalg.cholesky(rand_spd(rng, n=M))[None].astype(np.float32)
        ).repeat(O, 0),
        jnp.asarray(np.linalg.cholesky(rand_spd(rng, n=M))[None].astype(np.float32)),
    ]
    fast = gpmath.ar_joint_posterior_fast(L, Li, ums, uts)
    fac = gpmath.ar_joint_posterior_factored(L, Li, ums, uts)
    np.testing.assert_allclose(
        np.asarray(gpmath.mm(L, fac.v)),
        np.asarray(fast.mean), rtol=1e-4, atol=1e-5,
    )


def test_tri3_and_rows2_blocks_bitwise_match_plain_slices():
    """tri3_blocks/rows2_blocks/_diag_blocks: forward AND gradients are
    bitwise-equal to plain static slices — the hand VJPs only replace the
    T summed full-matrix pad cotangents with one fused assembly."""
    import numpy as np

    from vargp_tpu.gpmath.conditional import _diag_blocks
    from vargp_tpu.gpmath.linalg import rows2_blocks, tri3_blocks

    key = jax.random.PRNGKey(3)
    k, h = 20, 8
    A = jax.random.normal(key, (3, 2, k, k))
    co = jax.random.normal(jax.random.PRNGKey(4), (3, 2, k, k))

    def plain3(A):
        return A[..., :h, :h], A[..., h:, :h], A[..., h:, h:]

    outs_new = tri3_blocks(A, h)
    outs_old = plain3(A)
    for n, o in zip(outs_new, outs_old):
        np.testing.assert_array_equal(np.asarray(n), np.asarray(o))

    def loss_of(split):
        def f(A):
            a, b, c = split(A)
            return jnp.sum(
                jnp.square(a) * co[..., :h, :h]
            ) + jnp.sum(b * co[..., h:, :h]) + jnp.sum(jnp.exp(c * 0.1))
        return f

    g_new = jax.grad(loss_of(lambda A: tri3_blocks(A, h)))(A)
    g_old = jax.grad(loss_of(plain3))(A)
    np.testing.assert_array_equal(np.asarray(g_new), np.asarray(g_old))

    # rows2
    W = jax.random.normal(key, (3, k, 5))
    f_new = lambda W: sum(jnp.sum(jnp.square(p)) for p in rows2_blocks(W, h))
    f_old = lambda W: jnp.sum(jnp.square(W[..., :h, :])) + jnp.sum(
        jnp.square(W[..., h:, :])
    )
    np.testing.assert_array_equal(
        np.asarray(jax.grad(f_new)(W)), np.asarray(jax.grad(f_old)(W))
    )

    # _diag_blocks (T diagonal M-blocks)
    T, M = 4, 5
    B = jax.random.normal(key, (2, T * M, T * M))
    def plain_diag(B):
        return jnp.stack(
            [B[..., t * M : (t + 1) * M, t * M : (t + 1) * M] for t in range(T)],
            axis=-3,
        )
    fd_new = lambda B: jnp.sum(jnp.square(_diag_blocks(B, T, M)))
    fd_old = lambda B: jnp.sum(jnp.square(plain_diag(B)))
    np.testing.assert_array_equal(
        np.asarray(jax.grad(fd_new)(B)), np.asarray(jax.grad(fd_old)(B))
    )


def test_diag_blocks_concat_backward_bitwise():
    """The large-S concat-assembly backward (no (T, M, T, M) canvas — the
    eye-mask build's tile-padded canvas OOMs the v5e at S=5120) is
    bitwise-equal to the eye-mask build, and a grad through _diag_blocks
    at a threshold-crossing chain size matches plain-slice AD."""
    import numpy as np

    from vargp_tpu.gpmath.conditional import (
        _DIAG_BLOCKS_CONCAT_MIN_S,
        _diag_blocks,
        _diag_blocks_bwd_concat,
    )

    # (a) concat build == eye-mask build, bitwise, on small shapes
    T, M = 5, 7
    g = jax.random.normal(jax.random.PRNGKey(0), (3, 2, T, M, M))
    eye = jnp.eye(T, dtype=g.dtype)
    big = eye[:, None, :, None] * g[..., :, :, None, :]
    ref = big.reshape(*g.shape[:-3], T * M, T * M)
    got = _diag_blocks_bwd_concat(T, M, g)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # (b) end-to-end grad at S >= threshold (the concat path) == plain AD
    T2 = 4
    M2 = _DIAG_BLOCKS_CONCAT_MIN_S // T2
    S2 = T2 * M2
    assert S2 >= _DIAG_BLOCKS_CONCAT_MIN_S
    B = jax.random.normal(jax.random.PRNGKey(1), (S2, S2))
    co = jax.random.normal(jax.random.PRNGKey(2), (T2, M2, M2))

    def plain_diag(B):
        return jnp.stack(
            [B[t * M2 : (t + 1) * M2, t * M2 : (t + 1) * M2] for t in range(T2)],
            axis=-3,
        )

    fd_new = lambda B: jnp.sum(_diag_blocks(B, T2, M2) * co)
    fd_old = lambda B: jnp.sum(plain_diag(B) * co)
    np.testing.assert_array_equal(
        np.asarray(jax.grad(fd_new)(B)), np.asarray(jax.grad(fd_old)(B))
    )
