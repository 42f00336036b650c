"""TPU-queue marker guard: stale detection + capped wait.

Round-4 postmortem: a SIGKILLed queue leaked its bare marker file and the
driver's scoring ``python bench.py`` waited 5400 s on it, recording nothing
(VERDICT.md round 4, headline). These tests pin the fix in
utils/queue_guard.py: PID-stamped markers, dead-owner/age/legacy staleness,
and a hard wait cap.
"""

import os
import subprocess
import time

from homogenization_jl_tpu.utils.queue_guard import (
    _marker_is_stale,
    wait_for_tpu_queue,
)


def _write(path, text=""):
    with open(path, "w") as f:
        f.write(text)


def test_legacy_empty_marker_is_reaped(tmp_path):
    m = str(tmp_path / "marker")
    _write(m)
    t0 = time.time()
    wait_for_tpu_queue(timeout_s=60, marker=m, poll_s=0.05)
    assert time.time() - t0 < 5
    assert not os.path.exists(m)


def test_dead_pid_marker_is_reaped(tmp_path):
    p = subprocess.Popen(["sleep", "0.05"])
    pid = p.pid
    p.wait()
    m = str(tmp_path / "marker")
    _write(m, str(pid))
    wait_for_tpu_queue(timeout_s=60, marker=m, poll_s=0.05)
    assert not os.path.exists(m)


def test_old_marker_is_reaped_even_with_live_pid(tmp_path):
    m = str(tmp_path / "marker")
    _write(m, str(os.getpid()))  # own PID: definitely alive
    old = time.time() - 10_000
    os.utime(m, (old, old))
    assert _marker_is_stale(m, stale_age_s=7200)
    wait_for_tpu_queue(timeout_s=60, marker=m, poll_s=0.05)
    assert not os.path.exists(m)


def test_live_marker_waits_then_caps(tmp_path):
    p = subprocess.Popen(["sleep", "30"])
    try:
        m = str(tmp_path / "marker")
        _write(m, str(p.pid))
        assert not _marker_is_stale(m, stale_age_s=7200)
        t0 = time.time()
        wait_for_tpu_queue(timeout_s=0.5, marker=m, poll_s=0.05)
        dt = time.time() - t0
        assert 0.4 < dt < 10  # waited to the cap, no longer
        assert os.path.exists(m)  # live marker NOT reaped
    finally:
        p.kill()
        p.wait()


def test_queue_member_skips(tmp_path, monkeypatch):
    m = str(tmp_path / "marker")
    _write(m)
    monkeypatch.setenv("HZT_TPU_QUEUE_MEMBER", "1")
    t0 = time.time()
    wait_for_tpu_queue(timeout_s=60, marker=m, poll_s=0.05)
    assert time.time() - t0 < 1
