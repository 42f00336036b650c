#!/bin/bash
# Round-4 queue, part H: the composed-default decision grid at BENCH_N=16
# (23.8M DOFs — documented to measure within 2% of the 190M DOF/s figure,
# bench.py header; chol coarse on both arms of every A/B so comparisons
# stay internally consistent). The remote-compile latency this session
# (271 s for one n=32 program) makes the full grid unaffordable at n=32;
# the winner gets ONE n=32 confirmation run afterwards.
export HZT_TPU_QUEUE_MEMBER=1
rm -f /tmp/TPU_QUEUE_DONE
touch /tmp/TPU_QUEUE_RUNNING
trap 'rm -f /tmp/TPU_QUEUE_RUNNING; touch /tmp/TPU_QUEUE_DONE' EXIT
cd /root/repo
mkdir -p /tmp/tpu_runs

run() {
  tag=$1; shift
  echo "=== $tag ==="
  env "$@" BENCH_N=16 timeout 1500 python -u bench.py \
    > /tmp/tpu_runs/bench16_$tag.log 2>&1
  echo "$tag exit=$?"
  grep -a '"metric"' /tmp/tpu_runs/bench16_$tag.log | tail -1
}

run base
run steps2 BENCH_SMOOTH_STEPS=2
run steps2_khigh BENCH_SMOOTH_STEPS=2 BENCH_KRYLOV_PRECISION=high
run stack_steps2 BENCH_SMOOTH_STEPS=2 BENCH_KRYLOV_PRECISION=high \
  BENCH_RESTRICT_PRECISION=high BENCH_DIRECTION_DTYPE=bfloat16
run stack_steps3 BENCH_KRYLOV_PRECISION=high BENCH_RESTRICT_PRECISION=high \
  BENCH_DIRECTION_DTYPE=bfloat16
run steps1 BENCH_SMOOTH_STEPS=1
