"""Kernels with Bayesian (variational) hyperparameters.

Parity: var_gp/kernels.py — RBF-ARD with a factorized-normal variational
posterior over log-hyperparameters (D log-lengthscales + 1 log output
scale), and a deep (DKL) variant applying an MLP feature map first.
"""

from vargp_tpu.kernels.rbf import (
    cross_gram,
    sym_gram,
    RBFParams,
    RBFPrior,
    init_rbf,
    default_prior,
    sample_hypers,
    kl_hypers,
    gram,
    gram_diag,
)
from vargp_tpu.kernels.deep import (
    MLPParams,
    init_mlp,
    mlp_apply,
    deep_gram,
)

__all__ = [
    "cross_gram",
    "sym_gram",
    "RBFParams",
    "RBFPrior",
    "init_rbf",
    "default_prior",
    "sample_hypers",
    "kl_hypers",
    "gram",
    "gram_diag",
    "MLPParams",
    "init_mlp",
    "mlp_apply",
    "deep_gram",
]
