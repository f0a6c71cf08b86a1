"""Measured device-side timing via the JAX profiler (round-2 verdict #1).

Host wall-clock through this rig's axon relay is a dispatch rate — the
relay acks before compute completes and result fetches stall erratically
(observed: a 291 s stall on a 2 ms program, then stable ~30 ms) — so
rounds 1-2 modeled throughput from cost analysis with an ASSUMED 0.60
MXU utilization.  Round 3 found the real channel: ``jax.profiler``
traces through the axon PJRT plugin DO carry device-side events with
picosecond ``device_duration_ps`` per HLO op and per executable run
(verified: a 4096^3 bf16 matmul measures 707.5 us = 194 TFLOP/s = 98.7%
of the v5e 197 TFLOP/s peak, repeated across runs at back-to-back
offsets).  This module runs a compiled program N times under a trace,
parses the trace.json.gz, and returns measured per-call device time
plus a per-op breakdown (duration / FLOPs / bytes) — the measurement
bench.py, the frontier table, and the training-throughput table cite.

The reference (SURVEY §6) has no performance tooling at all; this is
the TPU-native equivalent of "time it with CUDA events".
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import tempfile
from dataclasses import dataclass, field

import jax


@dataclass
class OpTime:
    """One HLO op's aggregated device time across all runs in a trace."""

    name: str
    duration_s: float
    flops: float
    bytes_accessed: float
    category: str = ""
    count: int = 0
    # Model-level attribution (jit(...)/op-path) and python source line,
    # when the trace carries them — this is what lets the traffic table
    # name ops like "trunk conv0" instead of "fusion.15".
    tf_op: str = ""
    source: str = ""


@dataclass
class DeviceTiming:
    """Parsed device-side timing for one traced program."""

    # Per-run device durations of the top-level executable, seconds.
    run_durations_s: list[float]
    ops: list[OpTime] = field(default_factory=list)

    @property
    def num_runs(self) -> int:
        return len(self.run_durations_s)

    @property
    def median_run_s(self) -> float:
        d = sorted(self.run_durations_s)
        return d[len(d) // 2] if d else float("nan")

    @property
    def total_flops(self) -> float:
        return sum(o.flops for o in self.ops)

    @property
    def total_bytes(self) -> float:
        return sum(o.bytes_accessed for o in self.ops)

    def top_ops(self, n: int = 12) -> list[OpTime]:
        return sorted(self.ops, key=lambda o: -o.duration_s)[:n]


def _load_trace_events(trace_dir: str) -> list[dict]:
    paths = glob.glob(
        os.path.join(trace_dir, "plugins", "profile", "*", "*.trace.json.gz")
    )
    if not paths:
        return []
    latest = max(paths, key=os.path.getmtime)
    with gzip.open(latest, "rt") as f:
        return json.load(f).get("traceEvents", [])


def parse_trace(trace_dir: str, program_name: str) -> DeviceTiming | None:
    """Extract device timing for ``jit_<program_name>`` from a trace dir.

    Device events live under the pid whose process_name is a
    ``/device:TPU:*`` process: top-level executable runs are named
    ``jit_<name>(<fingerprint>)`` and carry ``device_duration_ps``;
    per-op events carry ``device_duration_ps`` + ``model_flops`` +
    ``bytes_accessed``.  Returns None when the trace has no device
    events for the program (e.g. a PJRT plugin without profiling).
    """
    events = _load_trace_events(trace_dir)
    device_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "/device:" in str(e.get("args", {}).get("name", ""))
    }
    runs: list[float] = []
    ops: dict[str, OpTime] = {}
    prefix = f"jit_{program_name}("
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        args = e.get("args") or {}
        dur_ps = args.get("device_duration_ps")
        if dur_ps is None:
            continue
        dur_s = float(dur_ps) * 1e-12
        name = str(e.get("name", ""))
        if name.startswith(prefix):
            runs.append(dur_s)
        elif "model_flops" in args or "bytes_accessed" in args:
            op = ops.get(name)
            if op is None:
                op = ops[name] = OpTime(
                    name=name,
                    duration_s=0.0,
                    flops=0.0,
                    bytes_accessed=0.0,
                    category=str(args.get("hlo_category", "")),
                    tf_op=str(args.get("tf_op", "")),
                    source=str(args.get("source", "")),
                )
            op.duration_s += dur_s
            op.flops += float(args.get("model_flops", 0) or 0)
            op.bytes_accessed += float(args.get("raw_bytes_accessed",
                                                args.get("bytes_accessed", 0)) or 0)
            op.count += 1
    if not runs:
        return None
    return DeviceTiming(run_durations_s=runs, ops=sorted(ops.values(),
                                                         key=lambda o: -o.duration_s))


def measure_device_time(
    fn, *args, iters: int = 10, warmup: int = 2, trace_dir: str | None = None,
    program_name: str | None = None,
) -> DeviceTiming | None:
    """Run ``fn(*args)`` under a profiler trace; return measured timing.

    ``fn`` should be a jitted function or AOT executable already
    compiled for ``args`` (run warmup before tracing so compile never
    lands inside the trace).  The per-op breakdown aggregates across all
    ``iters`` runs; ``run_durations_s`` has one entry per run.

    Returns None when the backend/profiler yields no device events —
    callers fall back to the cost-analysis roofline (rounds 1-2
    behavior).
    """
    name = program_name or getattr(fn, "__name__", None)
    if name is None:  # AOT executables: unwrap the module name
        try:
            name = fn._executable.xla_executable.hlo_modules()[0].name
            name = name.removeprefix("jit_")
        except Exception:
            name = "fn"
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    own = trace_dir is None
    trace_dir = trace_dir or tempfile.mkdtemp(prefix="jp_devtime_")
    jax.profiler.start_trace(trace_dir)
    try:
        out = None
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
    finally:
        jax.profiler.stop_trace()
    timing = parse_trace(trace_dir, name)
    if own:
        # Traces are ~10 KB; keep them only when the caller asked to
        # (passing trace_dir).  Remove ours even when parsing yielded
        # no device events — otherwise every fallback-path call leaks
        # a /tmp/jp_devtime_* directory.
        import shutil

        shutil.rmtree(trace_dir, ignore_errors=True)
    return timing
