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

import os


def enable_compilation_cache() -> str | None:
    """Point JAX's persistent compilation cache at the jointpose cache dir.

    Production cold-start on this rig pays 20-120 s of XLA compiles per
    program; the persistent cache makes a warm restart (same program,
    same jaxlib) skip them entirely.  Shares JOINTPOSE_CACHE_DIR with
    the Pallas-tail probe cache; disable with JOINTPOSE_NO_COMPILE_CACHE=1.
    Returns the cache dir, or None when disabled/unavailable.
    """
    if os.environ.get("JOINTPOSE_NO_COMPILE_CACHE"):
        return None
    cache_dir = os.path.join(
        os.environ.get("JOINTPOSE_CACHE_DIR", os.path.expanduser("~/.cache/jointpose")),
        "xla",
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Default threshold is 1 s — keep small steps cacheable too, but
        # skip trivial sub-100ms compiles that would bloat the dir.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        return cache_dir
    except Exception:  # cache is an optimization, never a failure mode
        return None


def add_platform_flag(parser) -> None:
    parser.add_argument(
        "--platform",
        choices=["default", "cpu"],
        default="default",
        help="force the JAX platform ('cpu' runs this entry point "
        "without the TPU, e.g. when the chip is unreachable)",
    )


def apply_platform(platform: str | None) -> None:
    """Apply ``--platform`` before any JAX backend use.

    Also enables the persistent compilation cache on the default (TPU)
    path — every CLI entry point calls this right after parse_args,
    which is exactly the before-first-backend-use moment both knobs
    need.  The cache stays OFF for --platform cpu: XLA:CPU AOT entries
    key on exact host machine features and a mismatched load warns of
    possible SIGILL, while CPU compiles are cheap anyway; the 20-120 s
    compiles the cache exists for are all on the TPU path.
    """
    if platform and platform != "default":
        import jax

        jax.config.update("jax_platforms", platform)
    else:
        enable_compilation_cache()
