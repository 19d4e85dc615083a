"""Kernel tests: closed-form properties + torch-oracle parity."""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from vargp_tpu import kernels
from vargp_tpu.kernels.rbf import RBFParams, RBFPrior


def test_gram_matches_naive_rbf():
    rng = np.random.default_rng(0)
    D, M, N, H = 3, 5, 4, 2
    theta = rng.standard_normal((H, D + 1)).astype(np.float32) * 0.3
    x = rng.standard_normal((M, D)).astype(np.float32)
    y = rng.standard_normal((N, D)).astype(np.float32)

    K = np.asarray(kernels.gram(jnp.asarray(theta), jnp.asarray(x), jnp.asarray(y)))
    assert K.shape == (H, M, N)

    for h in range(H):
        sig = np.exp(theta[h, :D])
        g2 = np.exp(2 * theta[h, D])
        sx, sy = x / sig, y / sig
        d2 = ((sx[:, None] - sy[None]) ** 2).sum(-1)
        np.testing.assert_allclose(K[h], g2 * np.exp(-0.5 * d2), rtol=1e-4, atol=1e-5)


def test_gram_batched_class_axis():
    rng = np.random.default_rng(1)
    D, M, O, H = 2, 4, 3, 2
    theta = rng.standard_normal((H, D + 1)).astype(np.float32) * 0.2
    x = rng.standard_normal((O, M, D)).astype(np.float32)
    K = np.asarray(kernels.gram(jnp.asarray(theta), jnp.asarray(x)))
    assert K.shape == (H, O, M, M)
    # symmetric PSD per (h, o)
    np.testing.assert_allclose(K, np.swapaxes(K, -1, -2), rtol=1e-5, atol=1e-6)
    for h in range(H):
        for o in range(O):
            w = np.linalg.eigvalsh(K[h, o])
            assert w.min() > -1e-5


def test_sample_hypers_and_kl():
    key = jax.random.key(0)
    params = RBFParams(
        log_mean=jnp.asarray([0.1, -0.2, 0.3]),
        log_logvar=jnp.asarray([-2.0, -2.0, -2.0]),
    )
    prior = RBFPrior(log_mean=jnp.zeros(3), log_logvar=jnp.zeros(3))

    s = kernels.sample_hypers(key, params, 10000)
    assert s.shape == (10000, 3)
    np.testing.assert_allclose(
        np.asarray(s).mean(0), np.asarray(params.log_mean), atol=0.01
    )
    np.testing.assert_allclose(
        np.asarray(s).std(0), np.exp(-1.0) * np.ones(3), atol=0.01
    )

    s_map = kernels.sample_hypers(key, params, 5, map_est=True)
    assert s_map.shape == (1, 3)
    np.testing.assert_allclose(np.asarray(s_map)[0], np.asarray(params.log_mean))

    kl = kernels.kl_hypers(params, prior)
    # closed form per-dim: 0.5 (var + mu^2 - 1 - logvar)
    var = np.exp(-2.0)
    mus = np.asarray(params.log_mean)
    expect = (0.5 * (var + mus**2 - 1 + 2.0)).sum()
    np.testing.assert_allclose(float(kl), expect, rtol=1e-5)
    assert float(kernels.kl_hypers(params, prior, map_est=True)) == 0.0


def test_gram_parity_with_reference(reference_modules):
    import torch

    rng = np.random.default_rng(2)
    D, M, N, H, O = 4, 6, 5, 3, 2
    theta = (rng.standard_normal((H, D + 1)) * 0.3).astype(np.float32)
    x = rng.standard_normal((O, M, D)).astype(np.float32)
    y = rng.standard_normal((O, N, D)).astype(np.float32)

    ours = np.asarray(kernels.gram(jnp.asarray(theta), jnp.asarray(x), jnp.asarray(y)))

    ref_k = reference_modules["kernels"].RBFKernel(D)
    theirs = ref_k.compute(torch.tensor(theta), torch.tensor(x), torch.tensor(y))
    np.testing.assert_allclose(ours, theirs.detach().numpy(), rtol=1e-4, atol=1e-5)

    ours_d = np.asarray(kernels.gram_diag(jnp.asarray(theta)))
    theirs_d = ref_k.compute_diag(torch.tensor(theta)).numpy()
    np.testing.assert_allclose(ours_d, theirs_d, rtol=1e-5)


def test_sym_gram_matches_gram_values_and_grads():
    """The fused-scaling symmetric Gram (production Kzz path) must equal
    the generic gram() oracle in value AND in every cotangent (z, theta)
    — the hand VJP shares no code with AD through gram()."""
    rng = np.random.default_rng(5)
    D, M, H, O = 7, 9, 3, 2
    theta = jnp.asarray((rng.standard_normal((H, D + 1)) * 0.3).astype(np.float32))
    z = jnp.asarray(rng.standard_normal((O, M, D)).astype(np.float32))

    K1 = kernels.sym_gram(theta, z)
    K2 = kernels.gram(theta, z)
    np.testing.assert_allclose(np.asarray(K1), np.asarray(K2), rtol=1e-5, atol=1e-6)

    w = jnp.asarray(rng.standard_normal(K1.shape).astype(np.float32))
    g1 = jax.grad(lambda th, zz: jnp.sum(w * kernels.sym_gram(th, zz)), argnums=(0, 1))(theta, z)
    g2 = jax.grad(lambda th, zz: jnp.sum(w * kernels.gram(th, zz)), argnums=(0, 1))(theta, z)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_sym_gram_pallas_interpret_matches_reference():
    """Interpret-mode run of the fused-scaling kernel vs the einsum
    reference — including the 64-row-tile path (M=9 -> 64 rows) and a
    shape that exercises 128-col padding (M=140 -> rows 192, cols 256)."""
    from vargp_tpu.ops.pallas.rbf_gram import _sym_gram_4d, sym_gram_pallas

    rng = np.random.default_rng(6)
    for O, M, D, H in ((2, 9, 7, 3), (1, 140, 5, 2)):
        z = jnp.asarray(rng.standard_normal((O, M, D)).astype(np.float32))
        invs = jnp.asarray(
            np.exp(rng.standard_normal((H, D)) * 0.2).astype(np.float32)
        )
        gamma2 = jnp.asarray(np.exp(rng.standard_normal(H) * 0.2).astype(np.float32))
        with jax.disable_jit():  # interpret pallas on CPU
            import unittest.mock as mock

            with mock.patch(
                "vargp_tpu.ops.pallas.rbf_gram.pl.pallas_call",
                functools.partial(pl.pallas_call, interpret=True),
            ):
                K = _sym_gram_4d.__wrapped__(z, invs, gamma2)
        sz = np.asarray(z)[None] * np.asarray(invs)[:, None, None, :]
        d2 = (
            np.sum(sz**2, -1)[..., :, None]
            - 2 * np.einsum("homd,hond->homn", sz, sz)
            + np.sum(sz**2, -1)[..., None, :]
        )
        expect = np.asarray(gamma2)[:, None, None, None] * np.exp(-0.5 * np.maximum(d2, 0))
        np.testing.assert_allclose(np.asarray(K), expect, rtol=1e-4, atol=1e-5)


def test_sym_gram_tri_interpret_matches_reference():
    """Triangle-skip variant (lower panels + in-VMEM mirror,
    VARGP_TPU_SYMGRAM=tri) vs the einsum reference, covering a 1-panel
    shape, a 2-panel shape with a partial last row panel (M=140 -> rows
    144, cols 256), and a 3-panel flagship-like shape (M=300 -> rows
    304, cols 384).  The mirror must reproduce the upper triangle
    exactly (same dot, transposed copy)."""
    from vargp_tpu.ops.pallas.rbf_gram import _sym_gram_4d_tri

    rng = np.random.default_rng(11)
    for O, M, D, H in ((2, 9, 7, 3), (1, 140, 5, 2), (1, 300, 4, 1)):
        z = jnp.asarray(rng.standard_normal((O, M, D)).astype(np.float32))
        invs = jnp.asarray(
            np.exp(rng.standard_normal((H, D)) * 0.2).astype(np.float32)
        )
        gamma2 = jnp.asarray(np.exp(rng.standard_normal(H) * 0.2).astype(np.float32))
        with jax.disable_jit():
            K = _sym_gram_4d_tri.__wrapped__(z, invs, gamma2, interpret=True)
        sz = np.asarray(z)[None] * np.asarray(invs)[:, None, None, :]
        d2 = (
            np.sum(sz**2, -1)[..., :, None]
            - 2 * np.einsum("homd,hond->homn", sz, sz)
            + np.sum(sz**2, -1)[..., None, :]
        )
        expect = np.asarray(gamma2)[:, None, None, None] * np.exp(-0.5 * np.maximum(d2, 0))
        np.testing.assert_allclose(np.asarray(K), expect, rtol=1e-4, atol=1e-5)
        # off-panel upper tiles are transposed COPIES of the lower ones —
        # bitwise equal (within a 128-panel, d2's a/b summation order
        # differs by rounding, so only near-symmetry holds there)
        Kn = np.asarray(K)
        np.testing.assert_allclose(
            Kn, np.swapaxes(Kn, -1, -2), rtol=1e-6, atol=1e-7
        )
        if M > 128:
            np.testing.assert_array_equal(
                Kn[..., :128, 128:M], np.swapaxes(Kn[..., 128:M, :128], -1, -2)
            )


def test_sym_gram_hand_vjp_matches_ad():
    """_sym_gram_bwd (the TPU production backward) vs AD through the
    reference einsum formula — the CPU dispatch path never runs the hand
    VJP, so check its math directly."""
    from vargp_tpu.ops.pallas.rbf_gram import _sym_gram_bwd

    rng = np.random.default_rng(9)
    D, M, H, O = 5, 8, 2, 3
    z = jnp.asarray(rng.standard_normal((O, M, D)).astype(np.float32))
    invs = jnp.asarray(np.exp(rng.standard_normal((H, D)) * 0.2).astype(np.float32))
    gamma2 = jnp.asarray(np.exp(rng.standard_normal(H) * 0.2).astype(np.float32))

    def ref(z, invs, gamma2):
        sz = z[None] * invs[:, None, None, :]
        d2 = (
            jnp.sum(sz**2, -1)[..., :, None]
            - 2 * jnp.einsum("homd,hond->homn", sz, sz)
            + jnp.sum(sz**2, -1)[..., None, :]
        )
        return gamma2[:, None, None, None] * jnp.exp(-0.5 * d2)

    K = ref(z, invs, gamma2)
    g = jnp.asarray(rng.standard_normal(K.shape).astype(np.float32))
    dz, d_invs, d_g2 = _sym_gram_bwd(None, (z, invs, gamma2, K), g)
    ad = jax.grad(
        lambda *a: jnp.sum(g * ref(*a)), argnums=(0, 1, 2)
    )(z, invs, gamma2)
    np.testing.assert_allclose(np.asarray(dz), np.asarray(ad[0]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(d_invs), np.asarray(ad[1]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(d_g2), np.asarray(ad[2]), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_deep_gram_shapes():
    key = jax.random.key(0)
    phi = kernels.init_mlp(key, in_size=10, hidden=32, feature_size=8)
    theta = jnp.zeros((2, 9))
    x = jax.random.normal(jax.random.key(1), (3, 5, 10))
    K = kernels.deep_gram(phi, theta, x)
    assert K.shape == (2, 3, 5, 5)
    feats = kernels.mlp_apply(phi, x)
    assert feats.shape == (3, 5, 8)
