"""Test harness: force an 8-device virtual CPU platform BEFORE jax imports.

This is the TPU answer to "test multi-chip without a cluster"
(SURVEY.md section 4): all sharding/mesh tests run against
``--xla_force_host_platform_device_count=8`` fakes.
"""

import os

os.environ.setdefault("JAX_ENABLE_X64", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# A site hook (e.g. a TPU-tunnel ``sitecustomize``) may have imported jax
# already with JAX_PLATFORMS pointed at hardware.  Backends are not
# initialised until first use, so flipping the *config* (not just the env
# var, which jax has already read) still wins — as long as no fixture
# touched a device yet, which is guaranteed at conftest import time.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "model"))


def has_torch() -> bool:
    try:
        import torch  # noqa: F401

        return True
    except Exception:
        return False


requires_reference = pytest.mark.skipif(
    not (has_reference() and has_torch()),
    reason="reference repo or torch unavailable",
)

requires_torch = pytest.mark.skipif(
    not has_torch(), reason="torch unavailable"
)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
