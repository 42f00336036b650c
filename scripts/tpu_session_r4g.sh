#!/bin/bash
# Round-4 queue, part G (runs after part F drains): the at-scale
# mixed-precision-PCG record (verdict item 4's TPU half), the two N=46
# ceiling retries from the round-3 queue that never reached the chip,
# and a flagship-driver steady-state check under the adopted stack.
export HZT_TPU_QUEUE_MEMBER=1
rm -f /tmp/TPU_QUEUE_DONE
touch /tmp/TPU_QUEUE_RUNNING
trap 'rm -f /tmp/TPU_QUEUE_RUNNING; touch /tmp/TPU_QUEUE_DONE' EXIT
cd /root/repo
mkdir -p /tmp/tpu_runs

echo "=== mixed-precision PCG at 190M: f64 depth at mostly-f32 cost ==="
timeout 3600 python -u scripts/run_mixed_pcg.py 32 5 30 1e-10 \
  > /tmp/tpu_runs/mixed_pcg32.log 2>&1
echo "mixed pcg 32 exit=$?"
if grep -q "RESOURCE_EXHAUSTED\|out of memory\|OOM" /tmp/tpu_runs/mixed_pcg32.log; then
  echo "=== fallback: mixed PCG at n=24 (80M) ==="
  timeout 3600 python -u scripts/run_mixed_pcg.py 24 5 30 1e-10 \
    > /tmp/tpu_runs/mixed_pcg24.log 2>&1
  echo "mixed pcg 24 exit=$?"
fi

echo "=== N=46 (566M) with bf16 chebyshev directions (ceiling attempt) ==="
BENCH_N=46 BENCH_SMOOTHER=chebyshev BENCH_DIRECTION_DTYPE=bfloat16 \
  timeout 3600 python -u bench.py > /tmp/tpu_runs/bench_n46_bf16dir.log 2>&1
echo "bench n46 bf16dir exit=$?"

echo "=== N=46 with the platform allocator (fragmentation was 5.18G of the miss) ==="
XLA_PYTHON_CLIENT_ALLOCATOR=platform BENCH_N=46 BENCH_SMOOTHER=chebyshev \
  timeout 3600 python -u bench.py > /tmp/tpu_runs/bench_n46_platform.log 2>&1
echo "bench n46 platform exit=$?"
