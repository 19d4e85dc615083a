"""Reference-checkpoint migration: load a real torch state_dict and verify
full forward parity against the reference model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vargp_tpu.kernels import default_prior
from vargp_tpu.models import vargp as V
from vargp_tpu.utils.torch_compat import (
    params_from_state_dict,
    prior_from_state_dict,
)


def test_state_dict_roundtrip_forward_parity(reference_modules):
    import torch

    torch.manual_seed(0)
    D, out, M = 3, 4, 6
    kernel = reference_modules["kernels"].RBFKernel(D, map_est=True)
    lik = reference_modules["likelihoods"].MulticlassSoftmax(n_f=5)
    z = torch.randn(out, M, D)
    gp = reference_modules["vargp"].VARGP(
        z, kernel, lik, n_var_samples=2, ep_var_mean=True, prev_params=None
    )
    sd = gp.state_dict()

    params = params_from_state_dict(sd)
    prior = prior_from_state_dict(sd)
    assert params.z.shape == (out, M, D)
    np.testing.assert_allclose(
        np.asarray(prior.log_mean), np.zeros(D + 1), atol=1e-6
    )

    x = torch.randn(7, D)
    with torch.no_grad():
        ref_mu, ref_var = gp(x)

    cfg = V.VARGPConfig(
        M=M, out_size=out, in_size=D, n_f=5, n_var_samples=2, map_est_hypers=True
    )
    res = V.forward(
        params, (), prior, jnp.asarray(x.numpy()), jax.random.key(0), cfg,
        with_kl=False,
    )
    np.testing.assert_allclose(
        np.asarray(res.f_mean), ref_mu.numpy(), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res.f_var), ref_var.numpy(), rtol=1e-2, atol=1e-4
    )


def test_dkl_state_dict_mapping(reference_modules):
    import torch

    torch.manual_seed(1)
    D, out, M = 8, 3, 4
    kernel = reference_modules["kernels"].DeepRBFKernel(
        D, feature_size=16, map_est=True
    )
    lik = reference_modules["likelihoods"].MulticlassSoftmax(n_f=5)
    z = torch.randn(out, M, D)
    gp = reference_modules["vargp"].VARGP(
        z, kernel, lik, n_var_samples=2, prev_params=None
    )
    params = params_from_state_dict(gp.state_dict())
    assert params.phi is not None

    # feature map parity
    from vargp_tpu.kernels import mlp_apply

    x = torch.randn(5, D)
    with torch.no_grad():
        ref_feats = kernel.phi(x).numpy()
    got = np.asarray(mlp_apply(params.phi, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, ref_feats, rtol=1e-4, atol=1e-5)
