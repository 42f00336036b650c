#!/bin/bash
# Round-4 queue, part I: the part-H decision grid with RETRY RATCHETING.
# This session's axon tunnel intermittently hangs a remote compile forever
# (two entries died at their timeout with zero output after 20+ min of
# compile silence). The persistent compilation cache makes kill+retry a
# ratchet: every completed program is cached, so each attempt re-plays
# cached compiles in seconds and re-requests only the hung one.
export HZT_TPU_QUEUE_MEMBER=1
export JAX_LOG_COMPILES=1
rm -f /tmp/TPU_QUEUE_DONE
touch /tmp/TPU_QUEUE_RUNNING
trap 'rm -f /tmp/TPU_QUEUE_RUNNING; touch /tmp/TPU_QUEUE_DONE' EXIT
cd /root/repo
mkdir -p /tmp/tpu_runs

run() {
  tag=$1; shift
  for attempt in 1 2 3 4; do
    echo "=== $tag attempt $attempt ==="
    env "$@" BENCH_N=16 timeout 780 python -u bench.py \
      >> /tmp/tpu_runs/bench16_$tag.log 2>&1
    rc=$?
    echo "$tag attempt $attempt exit=$rc"
    [ $rc -eq 0 ] && break
  done
  grep -a '"metric"' /tmp/tpu_runs/bench16_$tag.log | tail -1
}

run base
run stack_steps2 BENCH_SMOOTH_STEPS=2 BENCH_KRYLOV_PRECISION=high \
  BENCH_RESTRICT_PRECISION=high BENCH_DIRECTION_DTYPE=bfloat16
run steps2_khigh BENCH_SMOOTH_STEPS=2 BENCH_KRYLOV_PRECISION=high
run stack_steps3 BENCH_KRYLOV_PRECISION=high BENCH_RESTRICT_PRECISION=high \
  BENCH_DIRECTION_DTYPE=bfloat16
run steps2 BENCH_SMOOTH_STEPS=2
run steps1 BENCH_SMOOTH_STEPS=1
