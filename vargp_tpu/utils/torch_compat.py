"""Reference-checkpoint migration.

The reference persists one torch ``state_dict`` per task (ckpt{t}.pt,
experiments/vargp.py:69-71) with keys ``z``, ``u_mean``, ``u_tril_vec``,
``kernel.log_mean``, ``kernel.log_logvar``, ``kernel.prior_log_*`` and,
under DKL, ``kernel.phi.{0,2,4}.{weight,bias}``.  This module maps those
into VARGPParams pytrees so a user of the reference can carry an existing
checkpoint chain into this framework.

torch is an optional dependency here: state dicts can also be supplied as
plain ``{key: np.ndarray}`` mappings.
"""

import numpy as np
import jax.numpy as jnp

from vargp_tpu.kernels import MLPParams, RBFParams, RBFPrior
from vargp_tpu.models.vargp import VARGPParams


def _to_np(v):
    if hasattr(v, "detach"):  # torch tensor
        return v.detach().cpu().numpy()
    return np.asarray(v)


def params_from_state_dict(state_dict) -> VARGPParams:
    """Build VARGPParams from a reference VARGP state_dict (one task)."""
    sd = {k: _to_np(v) for k, v in state_dict.items()}
    phi = None
    if any(k.startswith("kernel.phi.") for k in sd):
        # reference MLP: Sequential(Linear, ReLU, Linear, ReLU, Linear)
        # with torch Linear weights stored (out, in) -> transpose to (in, out)
        weights, biases = [], []
        for i in (0, 2, 4):
            weights.append(jnp.asarray(sd[f"kernel.phi.{i}.weight"].T))
            biases.append(jnp.asarray(sd[f"kernel.phi.{i}.bias"]))
        phi = MLPParams(weights=tuple(weights), biases=tuple(biases))
    return VARGPParams(
        z=jnp.asarray(sd["z"]),
        u_mean=jnp.asarray(sd["u_mean"]),
        u_tril_vec=jnp.asarray(sd["u_tril_vec"]),
        kernel=RBFParams(
            log_mean=jnp.asarray(sd["kernel.log_mean"]),
            log_logvar=jnp.asarray(sd["kernel.log_logvar"]),
        ),
        phi=phi,
    )


def prior_from_state_dict(state_dict) -> RBFPrior:
    """Kernel hyperprior buffers from a reference state_dict."""
    sd = {k: _to_np(v) for k, v in state_dict.items()}
    return RBFPrior(
        log_mean=jnp.asarray(sd["kernel.prior_log_mean"]),
        log_logvar=jnp.asarray(sd["kernel.prior_log_logvar"]),
    )


def chain_from_torch_checkpoints(paths) -> list:
    """Load [ckpt0.pt .. ckptT.pt] into a VARGPParams chain (requires
    torch to unpickle)."""
    import torch

    chain = []
    for p in paths:
        sd = torch.load(p, map_location="cpu")
        chain.append(params_from_state_dict(sd))
    return chain
