"""Numerics sanitizers (SURVEY §5 "race detection / sanitizers").

The reference is single-threaded Python with no sanitizers; the
TPU-native equivalents are value-level checks compiled into the
program:

- :func:`checked_apply` — wraps a model apply in ``jax.experimental
  .checkify`` with NaN/Inf + out-of-bounds index checks; returns
  (errors, output) so tests/debug runs can assert cleanly instead of
  silently propagating NaNs.
- the ``--check-numerics`` CLI flag (jointpose.train) enables
  ``jax_debug_nans`` process-wide for fail-fast debugging.
- Pallas kernels run with ``interpret=True`` off-TPU (jointpose.ops
  .mrf_pallas), which is the Pallas-level sanitizer story.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.experimental import checkify


def checked_apply(apply_fn: Callable, *args, **kwargs):
    """Run ``apply_fn`` under checkify with float + index checks.

    Returns (error, output); call ``error.throw()`` to raise on the
    first NaN/Inf or out-of-bounds access recorded in the program.
    """
    checked = checkify.checkify(
        apply_fn, errors=checkify.float_checks | checkify.index_checks
    )
    return checked(*args, **kwargs)


def assert_finite_tree(tree, name: str = "tree") -> None:
    """Host-side finiteness assertion over a pytree (tests/debug only)."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            keys = "/".join(str(getattr(p, "key", p)) for p in path)
            raise AssertionError(f"non-finite values in {name}:{keys}")
