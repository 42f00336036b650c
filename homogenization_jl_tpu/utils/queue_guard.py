"""Staged-TPU-run-queue guard marker.

A second concurrent TPU process preallocating HBM crashes the axon worker
for BOTH processes, so long measurement queues (scripts/tpu_queue.sh) hold a
marker file while they own the chip and every other entry point waits on it.

Round-4 postmortem (VERDICT.md): the round-4 queue was SIGKILLed mid-compile,
its EXIT trap never fired, the bare ``touch``-style marker leaked, and the
driver's scoring ``python bench.py`` then waited 5400 s on a dead queue —
recording nothing. This module is the fix, used by ``bench.py`` and
``__graft_entry__.entry()``:

- the marker *contains the queue owner's PID* (written by scripts/tpu_queue.sh);
- a marker is STALE — deleted, then ignored — when its PID is dead, when it
  carries no PID (a leaked legacy ``touch`` marker), or when it is older than
  ``stale_age_s``;
- the wait is capped at ``timeout_s`` (default 600 s, was 5400) so a scoring
  run degrades to contending for the chip instead of timing out silently.
"""

from __future__ import annotations

import os
import time

MARKER = "/tmp/TPU_QUEUE_RUNNING"


def _marker_is_stale(marker: str, stale_age_s: float) -> bool:
    try:
        st = os.stat(marker)
    except OSError:
        return False  # gone — nothing to judge
    if time.time() - st.st_mtime > stale_age_s:
        return True
    try:
        with open(marker) as f:
            pid = int(f.read().strip() or "0")
    except (OSError, ValueError):
        pid = 0
    if pid <= 0:
        return True  # legacy / leaked marker with no owner recorded
    try:
        os.kill(pid, 0)  # signal 0: existence check only
    except ProcessLookupError:
        return True
    except PermissionError:
        return False  # exists, owned by someone else
    return False


def wait_for_tpu_queue(
    timeout_s: float = 600.0,
    stale_age_s: float = 7200.0,
    marker: str = MARKER,
    poll_s: float = 10.0,
) -> None:
    """Block while a LIVE queue owns the chip; reap stale markers; cap the wait.

    Queue members (HZT_TPU_QUEUE_MEMBER=1) return immediately — waiting on
    their own marker would deadlock the queue.
    """
    if os.environ.get("HZT_TPU_QUEUE_MEMBER") == "1":
        return
    t0 = time.time()
    while os.path.exists(marker) and time.time() - t0 < timeout_s:
        if _marker_is_stale(marker, stale_age_s):
            try:
                os.remove(marker)
            except OSError:
                pass
            return
        time.sleep(poll_s)
