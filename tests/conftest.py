"""Test configuration: CPU backend with an 8-device virtual mesh.

Multi-chip sharding tests run on a virtual CPU mesh (the reference's
config-matrix analog, SURVEY.md §4: test multi-node without a cluster);
benchmarks (bench.py) run on real TPU hardware instead.
"""

import os

# Must be set before JAX initializes its backends.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS=cpu from the environment; the
# config update below is authoritative.
jax.config.update("jax_platforms", "cpu")
# float64 plans (the pffftd_ parity surface) are exercised on CPU.
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]
