"""Per-checkpoint summary refresh in the fullscale driver script
(VERDICT r4 weak #2): an externally-killed run must leave a CURRENT
summary.json — iters_completed matching log.jsonl — not the stale
artifact of the previous clean exit.

Runs the real scripts/overthrust_fullscale_ms.py (--small) in a
subprocess and SIGKILLs it after the first checkpoint lands, exactly the
external-timeout failure mode that produced the round-4 staleness."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

pytestmark = pytest.mark.slow  # subprocess inversion: nightly lane

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "overthrust_fullscale_ms.py")


def _iters_in_log(run_dir):
    n = 0
    with open(os.path.join(run_dir, "log.jsonl")) as f:
        for line in f:
            if "event" not in json.loads(line):
                n += 1
    return n


def test_killed_run_leaves_current_summary(tmp_path):
    run_dir = str(tmp_path / "run")
    env = dict(os.environ, TPUFWI_TEST_FORCE_CPU="1")
    p = subprocess.Popen(
        [sys.executable, SCRIPT, "--small", "--iters", "3",
         "--run-dir", run_dir],
        env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    summary = os.path.join(run_dir, "summary.json")
    deadline = time.time() + 600
    try:
        # wait for the FIRST per-checkpoint refresh, then kill hard
        while time.time() < deadline:
            if os.path.exists(summary):
                break
            if p.poll() is not None:
                out = p.stdout.read().decode(errors="replace")
                raise AssertionError(
                    f"driver exited rc={p.returncode} before any "
                    f"checkpoint:\n{out[-2000:]}"
                )
            time.sleep(1.0)
        else:
            raise AssertionError("no summary.json within 600 s")
        p.send_signal(signal.SIGKILL)
        p.wait(timeout=60)
    finally:
        if p.poll() is None:
            p.kill()

    s = json.load(open(summary))
    assert s.get("partial") is True
    # the refresh fires after the iterate's JSONL record: the two are
    # consistent at every kill point
    assert s["iters_completed"] == _iters_in_log(run_dir)
    assert s["iters_completed"] >= 1
    assert 0 < s["err_ratio_illuminated_third"] < 2.0
    assert os.path.exists(os.path.join(run_dir, "ckpt.npz"))
