"""Shared Pallas environment policy for the ops modules.

One definition (rather than a copy per kernel module) so a future
policy change — e.g. an env var forcing interpret mode on TPU for
debugging, or GPU support — touches exactly one place.
"""

from __future__ import annotations

import jax


def use_interpret() -> bool:
    """Run Pallas kernels in interpret mode everywhere but real TPU.

    The CPU test suite (tests/conftest.py forces JAX_PLATFORMS=cpu)
    exercises kernel *logic* through the interpreter; compiled-on-TPU
    behavior is covered by bench.py's on-device parity check.
    """
    return jax.default_backend() != "tpu"
