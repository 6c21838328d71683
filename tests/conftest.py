"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host CPU devices via XLA's host-platform device-count override,
exactly as the driver's dryrun does.

Note: the ambient environment may register a remote TPU PJRT plugin from
sitecustomize (PALLAS_AXON_POOL_IPS).  Tests force JAX_PLATFORMS=cpu so it
is never used, but its background threads block interpreter exit for ~60s;
pytest_unconfigure therefore hard-exits once the summary is printed.
"""

import os
import sys

# Must be set before jax is imported anywhere.  Force CPU: the ambient
# environment may point JAX_PLATFORMS at a (slow, remote) TPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# sitecustomize may have imported jax already (freezing JAX_PLATFORMS=axon
# from the ambient env), so update the live config as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # CPU tests: full precision

import numpy as np  # noqa: E402
import pytest  # noqa: E402

_exit_status = [0]


def pytest_sessionfinish(session, exitstatus):
    _exit_status[0] = int(exitstatus)


def pytest_unconfigure(config):
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(_exit_status[0])


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)
