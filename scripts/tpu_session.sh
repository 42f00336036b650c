#!/bin/bash
# Round-4 sequential TPU queue (ONE process at a time). Completed entries
# are NOT repeated — logs in /tmp/tpu_runs, numbers in PERFORMANCE.md /
# ACCURACY.md:
#   * combine variants microbench (parity in isolation) + bench.py merged
#     A/B (11x END-TO-END regression, 9.36 s/cycle — merged REJECTED);
#   * bench.py current-combine baseline (0.799 s/cycle this session);
#   * st1 3D alpha=100 with pcg (stall rescued: 2.84 -> 4.5e-6);
#   * bench.py pcg mode (iters_to_1e3=8, 5.03 s — but the vcycle headline
#     was invalid: compile time inside the timing pair; bench.py now warms
#     both programs, hence the rerun below).
#
# Children must NOT wait on the queue marker they run under (round-3 advisor
# finding: without this export, every queued bench self-waited on its own
# marker until its timeout).
export HZT_TPU_QUEUE_MEMBER=1
touch /tmp/TPU_QUEUE_RUNNING
trap 'rm -f /tmp/TPU_QUEUE_RUNNING; touch /tmp/TPU_QUEUE_DONE' EXIT
cd /root/repo
mkdir -p /tmp/tpu_runs

echo "=== north-star: FMG start + PCG (expected best; decides the default) ==="
BENCH_SOLVE_MODE=fmg_pcg BENCH_SMOOTHER=chebyshev \
  timeout 3600 python -u bench.py > /tmp/tpu_runs/bench_fmg_pcg.log 2>&1
echo "bench fmg_pcg exit=$?"

echo "=== north-star: V-cycle-preconditioned CG (rerun with fixed warmup) ==="
BENCH_SOLVE_MODE=pcg BENCH_SMOOTHER=chebyshev \
  timeout 3600 python -u bench.py > /tmp/tpu_runs/bench_pcg.log 2>&1
echo "bench pcg exit=$?"

echo "=== bench.py default (vcycle cg_exact): 0.659 vs 0.799 s/cycle variance check ==="
timeout 3600 python -u bench.py > /tmp/tpu_runs/bench_vcycle_recheck.log 2>&1
echo "bench vcycle recheck exit=$?"

echo "=== cycles-to-tol: bare chebyshev (diagnostic: pcg-mode run saw r=2.59 after 15 bare cycles) ==="
BENCH_SMOOTHER=chebyshev timeout 3600 python -u scripts/iters_to_tol.py 32 5 40 \
  > /tmp/tpu_runs/iters_cheb.log 2>&1
echo "iters cheb exit=$?"

echo "=== cycles-to-tol: fmg + plain cycles (completes the mode grid) ==="
BENCH_FMG=1 timeout 3600 python -u scripts/iters_to_tol.py 32 5 30 \
  > /tmp/tpu_runs/iters_fmg.log 2>&1
echo "iters fmg exit=$?"

echo "=== bench.py bf16 direction storage A/B ==="
BENCH_DIRECTION_DTYPE=bfloat16 timeout 3600 python -u bench.py \
  > /tmp/tpu_runs/bench_bf16dir.log 2>&1
echo "bench bf16dir exit=$?"

echo "=== flagship driver inner=pcg A/B (vs recorded 0.73 s/cycle vcycle) ==="
FLAGSHIP_INNER=pcg timeout 5400 python -u scripts/run_flagship.py \
  > /tmp/tpu_runs/flagship_pcg.log 2>&1
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
timeout 5400 python -u scripts/run_mixed_pcg.py 24 5 30 1e-10 \
  > /tmp/tpu_runs/mixed_pcg24.log 2>&1
echo "mixed pcg exit=$?"

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
