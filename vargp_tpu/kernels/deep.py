"""Deep kernel (DKL): an MLP feature map under the RBF kernel.

Parity: var_gp/kernels.py:80-96 — phi = Linear(D,256)/ReLU/Linear(256,256)/
ReLU/Linear(256,64); RBF is applied on the 64-d features, so RBFParams has
feature_size+1 entries.  The MLP is a hand-rolled pytree (no framework
dependency); matmuls run bf16-friendly on the MXU with f32 accumulation.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vargp_tpu.kernels.rbf import gram

_HIGHEST = jax.lax.Precision.HIGHEST

DEFAULT_HIDDEN = 256
DEFAULT_FEATURES = 64


class MLPParams(NamedTuple):
    weights: tuple  # per-layer (in, out) matrices
    biases: tuple  # per-layer (out,) vectors


def init_mlp(
    key: jax.Array,
    in_size: int,
    hidden: int = DEFAULT_HIDDEN,
    feature_size: int = DEFAULT_FEATURES,
    dtype=jnp.float32,
) -> MLPParams:
    """Kaiming-uniform init matching torch.nn.Linear defaults so warm-starts
    from reference checkpoints land in the same scale."""
    dims = [in_size, hidden, hidden, feature_size]
    weights, biases = [], []
    for i in range(len(dims) - 1):
        key, wk, bk = jax.random.split(key, 3)
        fan_in = dims[i]
        bound = 1.0 / jnp.sqrt(fan_in)
        weights.append(
            jax.random.uniform(wk, (dims[i], dims[i + 1]), dtype, -bound, bound)
        )
        biases.append(jax.random.uniform(bk, (dims[i + 1],), dtype, -bound, bound))
    return MLPParams(weights=tuple(weights), biases=tuple(biases))


def mlp_apply(params: MLPParams, x: jax.Array) -> jax.Array:
    """phi(x): ReLU MLP over the trailing feature dim."""
    h = x
    n = len(params.weights)
    for i, (W, b) in enumerate(zip(params.weights, params.biases)):
        h = jnp.einsum("...d,df->...f", h, W, precision=_HIGHEST) + b
        if i < n - 1:
            h = jax.nn.relu(h)
    return h


def deep_gram(
    phi: MLPParams, theta: jax.Array, x: jax.Array, y: jax.Array | None = None,
    precision: str = "highest",
) -> jax.Array:
    """RBF Gram on MLP features (kernels.py:92-96)."""
    fx = mlp_apply(phi, x)
    fy = None if y is None else mlp_apply(phi, y)
    return gram(theta, fx, fy, precision=precision)
