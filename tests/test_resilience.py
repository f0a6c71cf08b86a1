"""Failure detection / auto-resume tests (SURVEY §5 aux subsystems).

Supervisor semantics are unit-tested against stub children (fast, no
jax import); the fault-injection and preemption paths are exercised
end-to-end against real tiny-config training subprocesses.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

from jointpose.resilience import (
    EXIT_PREEMPTED,
    Heartbeat,
    Supervisor,
    heartbeat_age,
)

STUB = """
import os, sys, time
sys.path.insert(0, {repo!r})
from jointpose.resilience import Heartbeat, EXIT_PREEMPTED

workdir = sys.argv[sys.argv.index("--workdir") + 1]
attempts_file = os.path.join(workdir, "attempts")
n = int(open(attempts_file).read()) if os.path.exists(attempts_file) else 0
open(attempts_file, "w").write(str(n + 1))
hb = Heartbeat(workdir, min_interval=0.0)
hb.beat(n)
{body}
"""

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_stub(tmp_path, body: str) -> list[str]:
    path = tmp_path / "stub.py"
    path.write_text(STUB.format(repo=REPO, body=body))
    return [sys.executable, str(path), "--workdir", str(tmp_path)]


def test_heartbeat_write_and_age(tmp_path):
    wd = str(tmp_path)
    assert heartbeat_age(wd) is None
    hb = Heartbeat(wd, min_interval=0.0)
    hb.beat(7)
    age = heartbeat_age(wd)
    assert age is not None and age < 5.0
    with open(os.path.join(wd, "heartbeat.json")) as f:
        assert json.load(f)["step"] == 7


def test_supervisor_restarts_after_crash(tmp_path):
    # Attempt 1 crashes (rc 3); attempt 2 succeeds.  One failure charged.
    cmd = make_stub(
        tmp_path,
        "sys.exit(3 if n == 0 else 0)",
    )
    sup = Supervisor(cmd, str(tmp_path), max_restarts=2, heartbeat_timeout=60)
    assert sup.run() == 0
    assert sup.restarts == 1
    events = [e["event"] for e in sup.events]
    assert "failure" in events and events[-1] == "done"
    # The restarted command resumes.
    relaunch = [e for e in sup.events if e["event"] == "launch"][1]
    assert "--resume" in relaunch["cmd"]


def test_supervisor_kills_hung_child_and_restarts(tmp_path):
    # Attempt 1 beats once then hangs; attempt 2 exits clean.
    cmd = make_stub(
        tmp_path,
        "time.sleep(30 if n == 0 else 0); sys.exit(0)",
    )
    sup = Supervisor(
        cmd, str(tmp_path), max_restarts=1, heartbeat_timeout=1.5,
        poll_interval=0.2, grace=5,
    )
    t0 = time.time()
    assert sup.run() == 0
    assert time.time() - t0 < 25, "hang was not detected promptly"
    assert sup.restarts == 1
    assert any(e["event"] == "heartbeat_stale" for e in sup.events)


def test_preemption_exit_resumes_without_charging_budget(tmp_path):
    cmd = make_stub(
        tmp_path,
        f"sys.exit({EXIT_PREEMPTED} if n == 0 else 0)",
    )
    sup = Supervisor(cmd, str(tmp_path), max_restarts=0, heartbeat_timeout=60)
    assert sup.run() == 0
    assert sup.restarts == 0
    assert any(e["event"] == "preempted" for e in sup.events)


def test_supervisor_gives_up_after_budget(tmp_path):
    cmd = make_stub(tmp_path, "sys.exit(7)")
    sup = Supervisor(cmd, str(tmp_path), max_restarts=1, heartbeat_timeout=60)
    assert sup.run() == 7
    assert sup.restarts == 2  # initial failure + one retried failure
    assert any(e["event"] == "giving_up" for e in sup.events)


def _train_cmd(workdir: str, steps: int = 20) -> list[str]:
    # --platform cpu is load-bearing: the boot hook re-pins JAX_PLATFORMS
    # in every fresh interpreter, so the env override below never reaches
    # jax — without the flag these subprocesses silently trained through
    # the TPU relay (and HUNG for ~35 min/attempt whenever the relay was
    # down, which is exactly the failure mode this subsystem exists for).
    return [
        sys.executable, "-m", "jointpose.train",
        "--config", "tiny", "--workdir", workdir,
        "--detector-steps", str(steps), "--joint-steps", "0",
        "--eval-max-batches", "1", "--platform", "cpu",
    ]


@pytest.mark.slow
def test_fault_injection_and_supervised_resume(tmp_path):
    # Hard-crash training at step 8 (no checkpoint yet), supervise it
    # back to completion; the marker keeps the fault one-shot.
    wd = str(tmp_path / "run")
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "JOINTPOSE_FAULT_AT_STEP": "8"}
    sup = Supervisor(
        _train_cmd(wd) + ["--resume"], wd, max_restarts=1, heartbeat_timeout=300,
        env=env,
    )
    rc = sup.run()
    assert rc == 0
    assert sup.restarts == 1
    assert os.path.exists(os.path.join(wd, ".fault_injected"))
    # Training completed: metrics contain the final eval at step 20.
    with open(os.path.join(wd, "metrics.jsonl")) as f:
        steps = [json.loads(line)["step"] for line in f]
    assert max(steps) == 20


@pytest.mark.slow
def test_sigterm_preempts_with_checkpoint(tmp_path):
    wd = str(tmp_path / "run")
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    proc = subprocess.Popen(_train_cmd(wd, steps=2000), env=env)
    try:
        # Wait for training to actually progress (first heartbeat step>=3).
        hb_path = os.path.join(wd, "heartbeat.json")
        # Generous: a contended CI box can take minutes of jax import +
        # first compile before the subprocess reaches its step loop (the
        # first heartbeat now lands after a whole steps_per_dispatch
        # chunk, and the scan-of-K program compiles slower than one step).
        deadline = time.time() + 900
        while time.time() < deadline:
            try:
                with open(hb_path) as f:
                    if json.load(f)["step"] >= 3:
                        break
            except (OSError, ValueError):
                pass
            time.sleep(0.5)
        else:
            pytest.fail("training never reached step 3")
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
    assert rc == EXIT_PREEMPTED
    # A checkpoint exists at (or after) the preemption step.
    latest_dir = os.path.join(wd, "checkpoints", "latest")
    steps = [int(d) for d in os.listdir(latest_dir) if d.isdigit()]
    assert steps and max(steps) >= 3
