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
