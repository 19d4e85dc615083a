"""Root pytest conftest.

The test suite runs on a virtual 8-device CPU platform (the TPU-native
analogue of multi-node testing without a cluster).  On machines where a TPU
PJRT plugin is force-registered from sitecustomize at interpreter start
(ignoring JAX_PLATFORMS), we must re-exec the pytest process with the
plugin's trigger env var cleared — an in-process switch is too late.

Set VARGP_TPU_TEST_PLATFORM=tpu to opt out and run tests on real TPU.
"""

import os
import sys

_REEXEC_FLAG = "VARGP_TPU_TEST_REEXEC"

# NOTE: sitecustomize itself imports jax, so jax is always in sys.modules by
# the time this runs; re-exec replaces the whole process, which is the point.
if (
    os.environ.get("VARGP_TPU_TEST_PLATFORM", "cpu") == "cpu"
    and os.environ.get(_REEXEC_FLAG) != "1"
):
    import subprocess

    env = dict(os.environ)
    env[_REEXEC_FLAG] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disables forced TPU registration
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    ret = subprocess.run(
        [sys.executable, "-m", "pytest", *sys.argv[1:]], env=env
    ).returncode
    os._exit(ret)
