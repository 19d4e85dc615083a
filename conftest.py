"""Root pytest conftest.

The test suite runs on a virtual 8-device CPU platform (the TPU-native
analogue of multi-node testing without a cluster).  Environments may
force-register a TPU PJRT plugin from sitecustomize at interpreter start;
the backend is only *chosen* at first use, so flipping the jax config here
(before any test imports touch a device) reliably selects CPU.

Set VARGP_TPU_TEST_PLATFORM=tpu to opt out and run tests on real TPU.
"""

import os

if os.environ.get("VARGP_TPU_TEST_PLATFORM", "cpu") == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


def pytest_addoption(parser):
    parser.addoption(
        "--slow",
        action="store_true",
        default=False,
        help="run the slow tier too (full suite; ~25 min on a 1-core host)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running e2e/parity test — excluded from the default "
        "fast tier; run with `pytest --slow` (see README)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow"):
        return
    import pytest

    skip = pytest.mark.skip(reason="slow tier: re-run with --slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
