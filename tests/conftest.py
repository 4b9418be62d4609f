"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh
(xla_force_host_platform_device_count), mirroring how the driver
dry-runs the multi-chip path.  Must run before jax initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

REFERENCE = pathlib.Path("/root/reference/regex_GPU_PHF")


@pytest.fixture(scope="session")
def reference_dir() -> pathlib.Path:
    if not REFERENCE.exists():
        pytest.skip("reference corpus not available")
    return REFERENCE
