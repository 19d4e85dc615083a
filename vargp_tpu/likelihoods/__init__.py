"""Likelihoods over GP marginals (parity: var_gp/likelihoods.py)."""

from vargp_tpu.likelihoods.softmax import (
    softmax_sample_logits,
    softmax_loss,
    softmax_predict,
)
from vargp_tpu.likelihoods.gaussian import (
    GaussianLikParams,
    init_gaussian,
    gaussian_loss,
    gaussian_predict,
)

__all__ = [
    "softmax_sample_logits",
    "softmax_loss",
    "softmax_predict",
    "GaussianLikParams",
    "init_gaussian",
    "gaussian_loss",
    "gaussian_predict",
]
