"""Seeding helpers (parity: var_gp/train_utils.py:13-18 set_seeds)."""

import random

import jax
import numpy as np


def seed_everything(seed: int | None):
    """Seed python/numpy and return a jax PRNG key.  None picks an arbitrary
    but logged seed (the reference leaves RNGs unseeded in that case)."""
    if seed is None:
        seed = random.SystemRandom().randrange(2**31)
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed), seed
