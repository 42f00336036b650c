#!/bin/bash
# Round-4 queue, part B: the entries the 12:45 kill cut off (sequential,
# ONE TPU process at a time). Diagnostics for the bare-chebyshev 190M stall
# first (they decide whether the preconditioner cycle needs a lam_max fix),
# then the N=46 ceiling retries, then mixed-precision PCG at scale.
export HZT_TPU_QUEUE_MEMBER=1
rm -f /tmp/TPU_QUEUE_DONE
touch /tmp/TPU_QUEUE_RUNNING
trap 'rm -f /tmp/TPU_QUEUE_RUNNING; touch /tmp/TPU_QUEUE_DONE' EXIT
cd /root/repo
mkdir -p /tmp/tpu_runs

echo "=== DIAGNOSTIC: bare chebyshev with full-precision smoothing (bf16x3 hypothesis) ==="
BENCH_SMOOTHER=chebyshev BENCH_SMOOTH_PRECISION=highest \
  timeout 3600 python -u scripts/iters_to_tol.py 32 5 25 \
  > /tmp/tpu_runs/iters_cheb_highest.log 2>&1
echo "iters cheb highest exit=$?"

echo "=== DIAGNOSTIC: chebyshev stall — per-level lam_max ==="
BENCH_SMOOTHER=chebyshev BENCH_LAM_LEVELS=1 \
  timeout 3600 python -u scripts/iters_to_tol.py 32 5 20 \
  > /tmp/tpu_runs/iters_cheb_lamlevels.log 2>&1
echo "iters cheb lamlevels exit=$?"

echo "=== DIAGNOSTIC: chebyshev stall — 200-iteration power method ==="
BENCH_SMOOTHER=chebyshev BENCH_LAM_ITERS=200 \
  timeout 3600 python -u scripts/iters_to_tol.py 32 5 20 \
  > /tmp/tpu_runs/iters_cheb_lam200.log 2>&1
echo "iters cheb lam200 exit=$?"

echo "=== DIAGNOSTIC: chebyshev stall — cg coarse (isolate the mg coarse) ==="
BENCH_SMOOTHER=chebyshev BENCH_COARSE=cg \
  timeout 3600 python -u scripts/iters_to_tol.py 32 5 15 \
  > /tmp/tpu_runs/iters_cheb_cgcoarse.log 2>&1
echo "iters cheb cgcoarse exit=$?"

echo "=== N=46 (566M) retry with bf16 chebyshev directions (ceiling attempt) ==="
BENCH_N=46 BENCH_SMOOTHER=chebyshev BENCH_DIRECTION_DTYPE=bfloat16 \
  timeout 3600 python -u bench.py > /tmp/tpu_runs/bench_n46_bf16dir.log 2>&1
echo "bench n46 exit=$? (OOM expected if the bf16 directions don't close the 1.57G gap)"

echo "=== N=46 with the platform allocator (fragmentation was 5.18G of the miss) ==="
XLA_PYTHON_CLIENT_ALLOCATOR=platform BENCH_N=46 BENCH_SMOOTHER=chebyshev \
  timeout 3600 python -u bench.py > /tmp/tpu_runs/bench_n46_platform.log 2>&1
echo "bench n46 platform exit=$?"

echo "=== mixed-precision PCG at scale: f64 depth at mostly-f32 cost ==="
timeout 5400 python -u scripts/run_mixed_pcg.py 24 5 30 1e-10 \
  > /tmp/tpu_runs/mixed_pcg24.log 2>&1
echo "mixed pcg exit=$?"
