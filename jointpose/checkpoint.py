"""Checkpoint/resume (SURVEY C13, §5).

Replaces the reference's ``tf.train.Saver`` save-best/restore with an
orbax ``CheckpointManager``: step-exact resume of params, optimizer
state, RNG key and data-epoch position, with a keep-best-by-PDJ
policy plus keep-last-N.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _manager(directory: str, keep: int) -> ocp.CheckpointManager:
    options = ocp.CheckpointManagerOptions(
        max_to_keep=keep,
        best_fn=lambda metrics: metrics.get("pdj_at_05_wrist_elbow", 0.0),
        best_mode="max",
        create=True,
    )
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


class Checkpointer:
    """Thin lifecycle wrapper so train.py stays free of orbax details."""

    def __init__(self, directory: str, keep: int = 3):
        self.directory = os.path.abspath(directory)
        self.manager = _manager(self.directory, keep)

    def save(self, step: int, state: Any, metrics: dict | None = None) -> None:
        metrics = {
            k: float(v)
            for k, v in (metrics or {}).items()
            if isinstance(v, (int, float, np.floating))
        }
        self.manager.save(
            step, args=ocp.args.StandardSave(state), metrics=metrics or None
        )
        self.manager.wait_until_finished()

    def latest_step(self) -> int | None:
        return self.manager.latest_step()

    def best_step(self) -> int | None:
        return self.manager.best_step()

    def restore(self, state_template: Any, step: int | None = None) -> Any:
        """Restore into the structure/shardings of ``state_template``."""
        step = step if step is not None else self.manager.latest_step()
        assert step is not None, f"no checkpoint found in {self.directory}"
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_template)
        return self.manager.restore(step, args=ocp.args.StandardRestore(target))

    def close(self) -> None:
        self.manager.close()
