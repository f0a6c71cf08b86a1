"""Failure detection & elastic recovery (SURVEY §5 aux subsystems).

The reference's recovery story is restart-by-hand with the Saver
restore flag; round-1 shipped step-exact resume but no failure
*detection*.  This module completes the subsystem with three pieces:

1. **Heartbeat** — the train loop writes a monotonic heartbeat file
   (step + wall time) every few steps; a stalled device, deadlocked
   dispatch, or hung host shows up as a stale heartbeat.
2. **Preemption hook** — SIGTERM (the standard preemption signal on
   TPU pools) flips a flag the train loop polls once per step; the loop
   checkpoints at the next step boundary and exits with
   ``EXIT_PREEMPTED`` so a supervisor (or the scheduler) can reschedule
   and resume losslessly.
3. **Supervisor** — runs training as a child process, auto-resumes on
   crash or preemption (``--resume`` is step-exact, train.py), kills
   and restarts on stale heartbeats, and gives up after a bounded
   number of *failures* (preemptions don't count against the budget).
   The child is killed by PID via the process handle — never by
   pattern.

Fault injection for drills/tests: ``JOINTPOSE_FAULT_AT_STEP=n`` hard-
crashes the training process (os._exit) at global step n, once per
workdir (a marker file keeps the fault from re-firing after resume).

CLI:
  python -m jointpose.resilience --max-restarts 3 -- \
      --config joint --workdir runs/j1
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time


EXIT_PREEMPTED = 85  # child exit code for a clean preemption checkpoint
HEARTBEAT_FILE = "heartbeat.json"


class Heartbeat:
    """Train-side: write {step, time} to <workdir>/heartbeat.json.

    Throttled to one write per ``min_interval`` seconds so per-step cost
    is a clock read.  The write is atomic (rename) so the supervisor
    never reads a torn file.
    """

    def __init__(self, workdir: str, min_interval: float = 1.0):
        os.makedirs(workdir, exist_ok=True)
        self.path = os.path.join(workdir, HEARTBEAT_FILE)
        self.min_interval = min_interval
        self._last = 0.0

    def beat(self, step: int) -> None:
        now = time.time()
        if now - self._last < self.min_interval:
            return
        self._last = now
        # process+pid-unique tmp: in multi-process runs every process
        # beats the same heartbeat file (latest writer wins; the content
        # — "this run is alive at step s" — is equivalent), but a shared
        # tmp name would let two concurrent writers tear each other's
        # file before the atomic rename.  The pid alone is not unique
        # across hosts that share the filesystem, so the JAX process
        # index is included too (0 when jax.distributed is not up).
        try:
            import jax

            proc = jax.process_index()
        except Exception:
            proc = 0
        tmp = f"{self.path}.{proc}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            json.dump({"step": int(step), "time": now}, f)
        os.replace(tmp, self.path)


def heartbeat_age(workdir: str) -> float | None:
    """Seconds since the last heartbeat, or None if none written yet."""
    path = os.path.join(workdir, HEARTBEAT_FILE)
    try:
        return time.time() - os.stat(path).st_mtime
    except OSError:
        return None


class PreemptionHandler:
    """Train-side SIGTERM hook: flip a flag, let the loop checkpoint.

    The loop polls ``preempted`` once per step (a bool read) and exits
    via ``exit_preempted()`` after saving.  Installing is idempotent;
    the previous handler is chained for foreign SIGTERM users.
    """

    def __init__(self):
        self.preempted = False
        self._prev = None

    def install(self) -> "PreemptionHandler":
        def _handler(signum, frame):
            self.preempted = True
            if callable(self._prev):
                self._prev(signum, frame)

        self._prev = signal.signal(signal.SIGTERM, _handler)
        return self

    @staticmethod
    def exit_preempted() -> None:
        sys.exit(EXIT_PREEMPTED)


def maybe_inject_fault(workdir: str, step: int) -> None:
    """Test/drill hook: hard-crash at JOINTPOSE_FAULT_AT_STEP, once.

    os._exit skips checkpoint flushing and atexit — the closest cheap
    approximation of a killed host.  The marker file makes the fault
    one-shot so the post-resume run can pass the same step.
    """
    target = os.environ.get("JOINTPOSE_FAULT_AT_STEP")
    # >= (not ==): the train loop may advance several steps per device
    # dispatch (steps_per_dispatch) and only calls this at chunk
    # boundaries — the fault fires at the first boundary at/past the
    # target, the marker keeps it one-shot.
    if target is None or step < int(target):
        return
    marker = os.path.join(workdir, ".fault_injected")
    if os.path.exists(marker):
        return
    with open(marker, "w") as f:
        f.write(str(step))
    print(f"[resilience] injecting fault at step {step}", flush=True)
    os._exit(41)


class Supervisor:
    """Run a training command with auto-resume on crash/hang/preemption.

    Args:
      cmd: full child argv (e.g. [sys.executable, '-m', 'jointpose.train',
        '--config', ..., '--workdir', workdir]).  '--resume' is appended
        for every restart if not already present.
      workdir: where the child writes its heartbeat.
      max_restarts: failure budget (crashes + hang-kills); preemption
        exits (EXIT_PREEMPTED) always resume and don't consume it.
      heartbeat_timeout: seconds of heartbeat silence before the child
        is declared hung.  Only enforced once a first heartbeat exists,
        so the initial compile doesn't trip it (bound it separately via
        start_timeout if needed) — but it MUST exceed the longest
        single blocking interval after that: a stage-boundary compile,
        a full eval, a checkpoint save.  Hang-kills charge the failure
        budget (a deterministic stall must not restart-loop forever),
        so a too-tight timeout costs real restarts.
      start_timeout: seconds to wait for the FIRST heartbeat of each
        attempt (None = unlimited).  The default bounds a wedged first
        compile / checkpoint restore — without it a child that hangs
        before its first completed step is never detected, since the
        heartbeat timer only arms once a beat exists.
    """

    def __init__(
        self,
        cmd: list[str],
        workdir: str,
        max_restarts: int = 3,
        heartbeat_timeout: float = 1800.0,
        poll_interval: float = 0.5,
        grace: float = 30.0,
        start_timeout: float | None = 3600.0,
        env: dict[str, str] | None = None,
    ):
        self.cmd = list(cmd)
        self.workdir = workdir
        self.max_restarts = max_restarts
        self.heartbeat_timeout = heartbeat_timeout
        self.poll_interval = poll_interval
        self.grace = grace
        self.start_timeout = start_timeout
        self.env = env
        self.restarts = 0
        self.events: list[dict] = []

    def _log(self, event: str, **kw) -> None:
        rec = {"event": event, "time": time.time(), **kw}
        self.events.append(rec)
        print(f"[supervisor] {event} {kw}", flush=True)
        os.makedirs(self.workdir, exist_ok=True)
        with open(os.path.join(self.workdir, "supervisor.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")

    def _watch(self, proc: subprocess.Popen) -> tuple[int, str]:
        """Wait for exit; kill on stale heartbeat.  -> (returncode, why)."""
        started = time.time()
        hb_path = os.path.join(self.workdir, HEARTBEAT_FILE)
        while True:
            rc = proc.poll()
            if rc is not None:
                return rc, "exit"
            try:
                hb_mtime = os.stat(hb_path).st_mtime
            except OSError:
                hb_mtime = None
            # Only beats from THIS attempt count — a stale file left by
            # the previous attempt must not kill a restarting child.
            if hb_mtime is None or hb_mtime < started:
                if (
                    self.start_timeout is not None
                    and time.time() - started > self.start_timeout
                ):
                    self._terminate(proc)
                    return proc.returncode, "no_first_heartbeat"
            elif time.time() - hb_mtime > self.heartbeat_timeout:
                self._log("heartbeat_stale", age_s=round(time.time() - hb_mtime, 1))
                self._terminate(proc)
                return proc.returncode, "hang"
            time.sleep(self.poll_interval)

    def _terminate(self, proc: subprocess.Popen) -> None:
        """SIGTERM (graceful: the child checkpoints), then SIGKILL."""
        proc.terminate()
        try:
            proc.wait(timeout=self.grace)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()

    def run(self) -> int:
        cmd = list(self.cmd)
        while True:
            self._log("launch", cmd=cmd, restarts=self.restarts)
            proc = subprocess.Popen(cmd, env=self.env)
            rc, why = self._watch(proc)
            if rc == 0:
                self._log("done")
                return 0
            resumed_cmd = cmd if "--resume" in cmd else cmd + ["--resume"]
            if rc == EXIT_PREEMPTED and why == "exit":
                # Clean EXTERNAL preemption checkpoint: always resume,
                # free of charge — the work is intact.  A hang-kill also
                # surfaces as EXIT_PREEMPTED (our own SIGTERM triggers
                # the child's preemption handler), so the `why` guard is
                # what keeps a deterministic stall from restart-looping
                # past the failure budget forever.
                self._log("preempted", rc=rc)
                cmd = resumed_cmd
                continue
            self.restarts += 1
            self._log("failure", rc=rc, why=why, restarts=self.restarts)
            if self.restarts > self.max_restarts:
                self._log("giving_up", rc=rc)
                return rc
            cmd = resumed_cmd


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        description="supervised training with auto-resume",
        usage="python -m jointpose.resilience [opts] -- <jointpose.train args>",
    )
    parser.add_argument("--max-restarts", type=int, default=3)
    parser.add_argument("--heartbeat-timeout", type=float, default=1800.0)
    parser.add_argument("--start-timeout", type=float, default=3600.0)
    parser.add_argument("train_args", nargs=argparse.REMAINDER,
                        help="arguments for jointpose.train after '--'")
    args = parser.parse_args(argv)
    train_args = args.train_args
    if train_args and train_args[0] == "--":
        train_args = train_args[1:]
    if "--workdir" not in train_args:
        parser.error("train args must include --workdir")
    workdir = train_args[train_args.index("--workdir") + 1]
    sup = Supervisor(
        [sys.executable, "-m", "jointpose.train", *train_args],
        workdir=workdir,
        max_restarts=args.max_restarts,
        heartbeat_timeout=args.heartbeat_timeout,
        start_timeout=args.start_timeout,
    )
    return sup.run()


if __name__ == "__main__":
    sys.exit(main())
