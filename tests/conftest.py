"""Test harness: run everything on CPU with 8 fake devices.

SURVEY.md §4 "Distributed tests without a cluster": force the host
platform and split it into 8 virtual devices so data-parallel sharding
is exercised without TPU hardware.  Must run before jax is imported.
"""

import os

# XLA_FLAGS is read when the CPU backend is created (lazily), so setting
# it here is early enough.  JAX_PLATFORMS however is captured when jax is
# *imported*, and this environment's sitecustomize imports jax at
# interpreter startup — so the platform must be forced through the config
# API below, not the env var.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NOTE: no persistent compilation cache here — in this environment CPU
# compiles may be served by a remote compile service whose host CPU
# features differ (cached AOT artifacts then warn about SIGILL risk).


@pytest.fixture(scope="session")
def tiny_config():
    from jointpose.configs import get_config

    return get_config("tiny")
