#!/bin/bash
# Sequential TPU runs (ONE process at a time), queued for when the chip is back.
# Pending hardware runs staged while the TPU tunnel was down (late round 3).
# Each writes to /tmp/tpu_runs/*.log; results go to PERFORMANCE.md/ACCURACY.md.
#
# Children must NOT wait on the queue marker they run under (round-3 advisor
# finding: without this export, every queued bench self-waited on its own
# marker and timed out).
export HZT_TPU_QUEUE_MEMBER=1
touch /tmp/TPU_QUEUE_RUNNING
trap 'rm -f /tmp/TPU_QUEUE_RUNNING; touch /tmp/TPU_QUEUE_DONE' EXIT
cd /root/repo
mkdir -p /tmp/tpu_runs
echo "=== combine variants microbench at bench scale ==="
BC_LEVELS=5 timeout 5400 python -u scripts/bench_combine.py 32 > /tmp/tpu_runs/combine32.log 2>&1
echo "combine exit=$?"
echo "=== bench.py baseline (current combine) ==="
timeout 3600 python -u bench.py > /tmp/tpu_runs/bench_current.log 2>&1
echo "bench exit=$?"
echo "=== bench.py merged combine ==="
HZT_COMBINE_MERGED=1 timeout 3600 python -u bench.py > /tmp/tpu_runs/bench_merged.log 2>&1
echo "bench merged exit=$?"
echo "=== st1 alpha=100 with pcg (the stall-rescue record) ==="
ST1_METHOD=pcg timeout 5400 python -u scripts/run_st1.py 32 4 100.0 40 > /tmp/tpu_runs/st1_pcg100.log 2>&1
echo "st1 exit=$?"
echo "=== cycles-to-tol: plain vs FMG start ==="
timeout 3600 python -u scripts/iters_to_tol.py 32 5 30 > /tmp/tpu_runs/iters_plain.log 2>&1
echo "iters plain exit=$?"
BENCH_FMG=1 timeout 3600 python -u scripts/iters_to_tol.py 32 5 30 > /tmp/tpu_runs/iters_fmg.log 2>&1
echo "iters fmg exit=$?"
BENCH_SMOOTHER=chebyshev timeout 3600 python -u scripts/iters_to_tol.py 32 5 40 > /tmp/tpu_runs/iters_cheb.log 2>&1
echo "iters cheb exit=$?"
BENCH_SMOOTHER=chebyshev BENCH_PCG=1 timeout 3600 python -u scripts/iters_to_tol.py 32 5 40 > /tmp/tpu_runs/iters_pcg.log 2>&1
echo "iters pcg exit=$?"
BENCH_SMOOTHER=chebyshev BENCH_PCG=1 BENCH_FMG=1 timeout 3600 python -u scripts/iters_to_tol.py 32 5 40 > /tmp/tpu_runs/iters_fmg_pcg.log 2>&1
echo "iters fmg+pcg exit=$?"
echo "=== bench.py bf16 direction storage ==="
BENCH_DIRECTION_DTYPE=bfloat16 timeout 3600 python -u bench.py > /tmp/tpu_runs/bench_bf16dir.log 2>&1
echo "bench bf16dir exit=$?"
# (2-step smoothing A/B dropped: CPU cycles-to-tol measurement settled it —
#  21 vs 12 cycles to 1e-3 at n=8, a net ~1.2x loss even at 0.7x cycle cost;
#  PERFORMANCE.md "Smoothing-step count".)
echo "=== flagship driver inner=pcg A/B (vs recorded 0.73 s/cycle vcycle) ==="
FLAGSHIP_INNER=pcg timeout 5400 python -u scripts/run_flagship.py > /tmp/tpu_runs/flagship_pcg.log 2>&1
echo "flagship pcg exit=$?"
echo "=== N=46 (566M) retry with bf16 chebyshev directions (ceiling attempt) ==="
BENCH_N=46 BENCH_SMOOTHER=chebyshev BENCH_DIRECTION_DTYPE=bfloat16 \
  timeout 3600 python -u bench.py > /tmp/tpu_runs/bench_n46_bf16dir.log 2>&1
echo "bench n46 exit=$? (OOM expected if the bf16 directions don't close the 1.57G gap)"
echo "=== N=46 with the platform allocator (fragmentation was 5.18G of the miss) ==="
XLA_PYTHON_CLIENT_ALLOCATOR=platform BENCH_N=46 BENCH_SMOOTHER=chebyshev \
  timeout 3600 python -u bench.py > /tmp/tpu_runs/bench_n46_platform.log 2>&1
echo "bench n46 platform exit=$?"
echo "=== mixed-precision PCG at scale: f64 depth at mostly-f32 cost ==="
timeout 5400 python -u scripts/run_mixed_pcg.py 24 5 30 1e-10 > /tmp/tpu_runs/mixed_pcg24.log 2>&1
echo "mixed pcg exit=$?"
