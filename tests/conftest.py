"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh
(xla_force_host_platform_device_count), mirroring how the driver
dry-runs the multi-chip path.

The environment may pre-register a TPU plugin and force
JAX_PLATFORMS before this file runs (interpreter-level site hooks),
so the platform override must go through jax.config, which wins over
the environment at backend-init time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib  # noqa: E402
import sys  # noqa: E402

import pytest  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from phfpfac_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

REFERENCE = pathlib.Path("/root/reference/regex_GPU_PHF")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (multi-process harness etc)"
    )


@pytest.fixture(scope="session")
def reference_dir() -> pathlib.Path:
    if not REFERENCE.exists():
        pytest.skip("reference corpus not available")
    return REFERENCE
