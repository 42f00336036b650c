#!/bin/bash
# Manifest-driven TPU measurement queue (replaces the round-4 one-shot
# tpu_session*.sh scripts — round-4 verdict item 7).
#
# Usage: ./scripts/tpu_queue.sh [manifest]   (default scripts/tpu_queue_manifest.txt)
#
# Manifest lines:  tag|timeout_s|attempts|command...
# ('#' comments and blank lines skipped; command runs under bash -c from the
# repo root with the queue env). Each attempt retries on rc=124 (timeout) or
# rc=137 (KILL fallback) with the timeout RATCHETED 1.5x per attempt — the
# axon plugin does not persist big-program executables, so a retry pays the
# full cold compile again and needs a longer window, not the same one.
#
# Marker protocol (round-4 verdict item 1 / advisor finding): the marker
# contains OUR PID so bench.py / entry() can detect a leaked marker (dead
# PID) and reap it instead of stalling; the trap also covers INT/TERM, and a
# SIGKILL leak is self-healing on the reader side via queue_guard.py.
set -u
cd "$(dirname "$0")/.."

MANIFEST=${1:-scripts/tpu_queue_manifest.txt}
STAMP=$(date -u +%Y%m%d_%H%M%S)
LOGDIR=/tmp/tpu_runs
mkdir -p "$LOGDIR"

export HZT_TPU_QUEUE_MEMBER=1
export JAX_LOG_COMPILES=1
rm -f /tmp/TPU_QUEUE_DONE
echo $$ > /tmp/TPU_QUEUE_RUNNING
trap 'rm -f /tmp/TPU_QUEUE_RUNNING; touch /tmp/TPU_QUEUE_DONE' EXIT INT TERM

while IFS='|' read -r tag tmo attempts cmd; do
  case "$tag" in ''|\#*) continue;; esac
  log="$LOGDIR/${tag}_${STAMP}.log"          # round-unique: never appends
  echo "=== queue $tag start $(date -u +%F' '%T) cmd: $cmd" > "$log"
  for attempt in $(seq 1 "$attempts"); do
    echo "=== $tag attempt $attempt/$attempts tmo=${tmo}s $(date -u +%T) ===" | tee -a "$log"
    # -k 60: if the hung XLA compile RPC ignores TERM, KILL it 60s later
    timeout -k 60 "$tmo" bash -c "$cmd" >> "$log" 2>&1
    rc=$?
    echo "=== $tag attempt $attempt exit=$rc $(date -u +%T) ===" | tee -a "$log"
    if [ "$rc" -ne 124 ] && [ "$rc" -ne 137 ]; then break; fi
    tmo=$(( tmo * 3 / 2 ))                   # ratchet: cold compiles recur
  done
done < "$MANIFEST"
echo "queue done $(date -u +%F' '%T)"
