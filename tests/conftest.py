"""Test configuration: force an 8-device virtual CPU platform so sharding /
collective tests run without TPU hardware (the TPU-native analogue of
multi-node tests without a cluster)."""

import os
import sys

# Platform selection (CPU x8 virtual devices) happens in the repo-root
# conftest.py via re-exec, before any jax import.

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    """The upstream PyTorch research code, used purely as a numerical test
    oracle (never imported into the framework itself)."""
    if not os.path.isdir(REFERENCE_DIR):
        return False
    try:
        import torch  # noqa: F401
    except ImportError:
        return False
    return True


@pytest.fixture(scope="session")
def reference_modules():
    """Import var_gp reference modules (torch-only ones) as oracles."""
    if not reference_available():
        pytest.skip("reference oracle not available")
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import var_gp.gp_utils as ref_gp_utils
    import var_gp.kernels as ref_kernels
    import var_gp.likelihoods as ref_likelihoods
    import var_gp.vargp as ref_vargp

    return dict(
        gp_utils=ref_gp_utils,
        kernels=ref_kernels,
        likelihoods=ref_likelihoods,
        vargp=ref_vargp,
    )
