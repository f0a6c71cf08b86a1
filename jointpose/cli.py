"""Shared CLI plumbing for the jointpose entry points.

Every entry point (train / evaluate / predict / serve / quantize /
resilience) accepts ``--platform cpu`` to run without the TPU.  This
must go through ``jax.config`` rather than ``JAX_PLATFORMS``: the
image's interpreter boot hook re-pins the env var at startup to prevent
silent CPU fallback, so an env override never reaches jax — and when
the TPU relay is unreachable, backend init BLOCKS for tens of minutes,
leaving the CLIs with no escape hatch otherwise.
"""

from __future__ import annotations


def add_platform_flag(parser) -> None:
    parser.add_argument(
        "--platform",
        choices=["default", "cpu"],
        default="default",
        help="force the JAX platform ('cpu' runs this entry point "
        "without the TPU, e.g. when the chip is unreachable)",
    )


def apply_platform(platform: str | None) -> None:
    """Apply ``--platform`` before any JAX backend use."""
    if platform and platform != "default":
        import jax

        jax.config.update("jax_platforms", platform)
