"""Test harness: run everything on CPU with 8 fake devices.

SURVEY.md §4 "Distributed tests without a cluster": force the host
platform and split it into 8 virtual devices so data-parallel sharding
is exercised without TPU hardware.  Must run before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402
import jax  # noqa: E402

# Persistent compilation cache: repeated test runs skip XLA recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/jointpose-xla-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(scope="session")
def tiny_config():
    from jointpose.configs import get_config

    return get_config("tiny")
