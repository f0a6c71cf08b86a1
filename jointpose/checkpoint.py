"""Checkpoint/resume (SURVEY C13, §5).

Replaces the reference's ``tf.train.Saver`` save-best/restore with
orbax.  TWO managers back the lifecycle:

- ``latest/``: keep-last-N without metrics — the crash-resume source of
  truth.  (A single manager with ``best_fn`` + ``max_to_keep`` deletes
  the NEWEST checkpoint whenever its metric isn't among the best —
  verified empirically — which would silently resume from an ancient
  step after a crash.)
- ``best/``: keep-best-1 by PDJ@0.05 wrist/elbow — the serving source
  of truth.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

RUN_METADATA_FILE = "run_config.json"


def load_run_metadata(directory: str) -> dict | None:
    """The saving run's recorded config, or None (pre-metadata runs).

    A corrupt/truncated file also returns None (with a warning) — the
    metadata is a safety net, and an unreadable net must degrade to the
    pre-metadata behavior rather than block every entry point.
    """
    path = os.path.join(os.path.abspath(directory), RUN_METADATA_FILE)
    try:
        with open(path) as f:
            return json.load(f)
    except OSError:
        return None
    except ValueError:  # includes json.JSONDecodeError
        print(f"[checkpoint] WARNING: unreadable {path}; ignoring metadata")
        return None


def reconcile_config(config, checkpoint_dir: str, pool_mode: str | None = None):
    """Resolve the architecture-mode config for restoring a checkpoint.

    The trunk's pool_mode changes behavior but not parameter shapes, so
    a mismatched restore succeeds and silently mis-evaluates — the
    classic trap being a checkpoint trained before a preset's default
    changed.  Priority: explicit CLI override > recorded checkpoint
    metadata > preset default; an override that CONTRADICTS recorded
    metadata is an error, and recorded metadata silently corrects a
    drifted preset default (with a notice).
    """
    from jointpose.configs import with_pool_mode

    meta = load_run_metadata(checkpoint_dir) or {}
    recorded = meta.get("pool_mode")
    if pool_mode is not None:
        if recorded is not None and recorded != pool_mode:
            raise ValueError(
                f"--pool-mode {pool_mode!r} contradicts the checkpoint's "
                f"recorded trunk mode {recorded!r} ({checkpoint_dir}); the "
                "modes share param shapes, so overriding would restore "
                "cleanly and silently mis-evaluate"
            )
        config = with_pool_mode(config, pool_mode)
    elif recorded is not None and recorded != config.detector.pool_mode:
        print(
            f"[checkpoint] adopting recorded pool_mode={recorded!r} "
            f"(preset default {config.detector.pool_mode!r})"
        )
        config = with_pool_mode(config, recorded)
    # Pin the head-conv impl the TRAINING run resolved 'auto' to: the
    # resolution is batch-dependent, and a serving batch that resolved
    # differently would run slightly different bf16 numerics than the
    # evaluated model (round-2 advisor finding).
    impl = meta.get("head_conv_impl_resolved")
    if impl is not None and config.detector.head_conv_impl == "auto":
        print(f"[checkpoint] pinning head_conv_impl={impl!r} (resolved at training)")
        config = config.replace(
            detector=dataclasses.replace(config.detector, head_conv_impl=impl)
        )
    return config


class Checkpointer:
    """Thin lifecycle wrapper so train.py stays free of orbax details.

    Pass ``config`` from training runs: the first save records it as
    ``run_config.json`` next to the managers, and a resume with a
    contradicting architecture mode fails fast instead of silently
    training a different network on restored weights.
    """

    def __init__(self, directory: str, keep: int = 3, config=None):
        self.directory = os.path.abspath(directory)
        self._config = config
        self._meta_written = False
        if config is not None:
            recorded = (load_run_metadata(self.directory) or {}).get("pool_mode")
            if recorded is not None and recorded != config.detector.pool_mode:
                raise ValueError(
                    f"checkpoint dir {self.directory} was written with "
                    f"pool_mode={recorded!r} but this run uses "
                    f"{config.detector.pool_mode!r}; pass --pool-mode "
                    f"{recorded} (param shapes match, behavior doesn't)"
                )
        # Legacy layout (step dirs directly under `directory`, from the
        # earlier single-manager design): serve reads from it as-is.
        legacy_steps = [
            d for d in (os.listdir(self.directory) if os.path.isdir(self.directory) else [])
            if d.isdigit()
        ]
        latest_dir = (
            self.directory if legacy_steps else os.path.join(self.directory, "latest")
        )
        # In legacy mode nothing is ever deleted: the old single-manager
        # layout may hold a kept-best step that a keep-last-N policy
        # would garbage-collect on the next save.
        # Distinct barrier_sync_key_prefix per manager: orbax's async-
        # commit barriers are keyed by STEP, so in multi-process runs
        # the two managers saving the SAME step (every full-model eval)
        # race on identical '_async_write_complete.<step>' keys in the
        # global coordination service — surfaced as FAILED_PRECONDITION
        # 'Barrier ... already ongoing' the first time a 2-process run
        # saved more than once per invocation (the round-5 supervised
        # multi-process drill, tests/test_resilience_multiprocess.py).
        mp = ocp.options.MultiprocessingOptions
        self._latest = ocp.CheckpointManager(
            latest_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=None if legacy_steps else keep, create=True,
                multiprocessing_options=mp(barrier_sync_key_prefix="latest"),
            ),
        )
        self._best = ocp.CheckpointManager(
            os.path.join(self.directory, "best"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=1,
                best_fn=lambda m: m.get("pdj_at_05_wrist_elbow", 0.0),
                best_mode="max",
                create=True,
                multiprocessing_options=mp(barrier_sync_key_prefix="best"),
            ),
        )

    def save(self, step: int, state: Any, metrics: dict | None = None) -> None:
        # Run metadata is host-side JSON with a single logical writer;
        # in multi-process runs only process 0 writes it (the orbax
        # saves below stay collective across all processes).
        if jax.process_index() != 0:
            self._meta_written = True
        if self._config is not None and not self._meta_written:
            # (Over)write once per run: the run writing checkpoints is
            # the source of truth — keeping an older run's metadata
            # (e.g. after retraining a different same-pool-mode config
            # into the same dir) would record a config the weights no
            # longer match.
            self._meta_written = True
            path = os.path.join(self.directory, RUN_METADATA_FILE)
            os.makedirs(self.directory, exist_ok=True)
            from jointpose.models.detector import resolve_head_conv_impl

            meta = {
                "config_name": self._config.name,
                "pool_mode": self._config.detector.pool_mode,
                # The impl 'auto' resolved to at the TRAINING batch —
                # restore surfaces adopt it so eval and serve provably
                # run the same head program (bf16 numerics differ
                # slightly between the direct and FFT impls).
                "head_conv_impl_resolved": resolve_head_conv_impl(
                    self._config.detector,
                    self._config.data.image_hw,
                    self._config.train.batch_size,
                ),
                "config": dataclasses.asdict(self._config),
            }
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(meta, f, indent=1, default=str)
            os.replace(tmp, path)
        metrics = {
            k: float(v)
            for k, v in (metrics or {}).items()
            if isinstance(v, (int, float, np.floating))
        }
        self._latest.save(step, args=ocp.args.StandardSave(state))
        if metrics:
            self._best.save(step, args=ocp.args.StandardSave(state), metrics=metrics)
        self._latest.wait_until_finished()
        self._best.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._latest.latest_step()

    def best_step(self) -> int | None:
        return self._best.best_step()

    def restore(self, state_template: Any, step: int | None = None) -> Any:
        """Restore into the structure/shardings of ``state_template``.

        ``step=None`` restores the latest; explicit steps are looked up
        in the latest manager first, then among the kept-best.
        """
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_template)
        if step is None:
            step = self._latest.latest_step()
            assert step is not None, f"no checkpoint found in {self.directory}"
            return self._latest.restore(step, args=ocp.args.StandardRestore(target))
        if step in self._latest.all_steps():
            return self._latest.restore(step, args=ocp.args.StandardRestore(target))
        return self._best.restore(step, args=ocp.args.StandardRestore(target))

    def restore_subtree(self, template: Any, step: int | None = None) -> Any:
        """Restore a subtree of the saved state (e.g. ``{'params': ...}``).

        Inference restores must not depend on reconstructing the saving
        run's optimizer layout (a train-time ``mrf_lr_mult`` wraps the
        optimizer in an extra chain and changes the opt_state pytree);
        orbax partial restore skips everything absent from ``template``.
        """
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        if step is None:
            step = self._latest.latest_step()
            assert step is not None, f"no checkpoint found in {self.directory}"
        mgr = self._latest if step in self._latest.all_steps() else self._best
        return mgr.restore(
            step, args=ocp.args.PyTreeRestore(item=target, partial_restore=True)
        )

    def close(self) -> None:
        self._latest.close()
        self._best.close()
