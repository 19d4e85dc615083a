"""Utilities: metrics logging, checkpointing, PRNG helpers."""

from vargp_tpu.utils.logging import MetricsLogger
from vargp_tpu.utils.checkpoint import save_chain, load_chain, save_pytree, load_pytree
from vargp_tpu.utils.prng import seed_everything

__all__ = [
    "MetricsLogger",
    "save_chain",
    "load_chain",
    "save_pytree",
    "load_pytree",
    "seed_everything",
]
