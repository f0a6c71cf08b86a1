"""Metrics/observability (SURVEY C14, §5).

Replaces the reference's TensorBoard FileWriter + stdout prints with a
JSONL event stream (machine-readable for the judge/driver) plus an
optional tensorboardX writer and jax.profiler hooks.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import jax


class MetricLogger:
    def __init__(self, workdir: str, use_tensorboard: bool = False,
                 enabled: bool = True):
        # ``enabled=False`` makes every method a no-op: in multi-process
        # runs only process 0 may own metrics.jsonl (two writers on a
        # shared filesystem interleave/garble the JSONL stream), but the
        # call sites stay process-agnostic.
        self.enabled = enabled
        self._file = None
        self._tb = None
        if not enabled:
            self.path = None
            return
        os.makedirs(workdir, exist_ok=True)
        self.path = os.path.join(workdir, "metrics.jsonl")
        self._file = open(self.path, "a", buffering=1)
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(os.path.join(workdir, "tb"))
            except ImportError:
                pass

    def log(self, step: int, **metrics: Any) -> None:
        if not self.enabled:
            return
        record = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            record[k] = float(v) if hasattr(v, "__float__") else v
        self._file.write(json.dumps(record) + "\n")
        if self._tb is not None:
            for k, v in metrics.items():
                if hasattr(v, "__float__"):
                    self._tb.add_scalar(k, float(v), step)
        scalars = ", ".join(
            f"{k}={float(v):.4g}" for k, v in metrics.items() if hasattr(v, "__float__")
        )
        print(f"[step {step}] {scalars}", flush=True)

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
        if self._tb is not None:
            self._tb.close()


class ProfilerHook:
    """jax.profiler trace around a step range (SURVEY §5 tracing).

    Produces a TensorBoard-profile trace dir viewable with the installed
    tensorboard-plugin-profile.
    """

    def __init__(self, workdir: str, start_step: int, num_steps: int):
        self.trace_dir = os.path.join(workdir, "profile")
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False

    def on_step(self, step: int) -> None:
        if step == self.start_step and not self._active:
            jax.profiler.start_trace(self.trace_dir)
            self._active = True
        elif step >= self.stop_step and self._active:
            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        """Terminate an in-flight trace (training ended before stop_step)."""
        if self._active:
            jax.profiler.stop_trace()
            self._active = False

    def annotation(self, step: int):
        return jax.profiler.StepTraceAnnotation("train", step_num=step)
