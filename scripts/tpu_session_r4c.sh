#!/bin/bash
# Round-4 queue, part C (runs the then-current working tree — includes the
# incremental-residual chebyshev smoother):
#   1. baseline re-measure of the fmg_pcg default on the incremental form
#      (prediction: ~0.55 s/iter — the restriction apply is gone and the
#      exit residual updates are incremental);
#   2. bare-chebyshev iters at 190M — stall-fix verification (bf16x3 inner
#      residual recomputation was the root cause; incremental updates scale
#      the error with ||p|| instead of ||x||);
#   3. Krylov matvec at HIGH (the last HIGHEST apply beside the post-smooth
#      entry residuals);
#   4. 2-step chebyshev under fmg_pcg (the bare-cycle rejection at n=8 may
#      not transfer to the PCG outer);
#   5. stacked candidate: krylov high + bf16 directions.
export HZT_TPU_QUEUE_MEMBER=1
rm -f /tmp/TPU_QUEUE_DONE
touch /tmp/TPU_QUEUE_RUNNING
trap 'rm -f /tmp/TPU_QUEUE_RUNNING; touch /tmp/TPU_QUEUE_DONE' EXIT
cd /root/repo
mkdir -p /tmp/tpu_runs

echo "=== baseline re-measure: fmg_pcg default on the incremental chebyshev ==="
timeout 3600 python -u bench.py > /tmp/tpu_runs/bench_r4c_base.log 2>&1
echo "base exit=$?"

echo "=== bare-chebyshev 190M stall-fix verification (incremental + lanczos lam) ==="
BENCH_SMOOTHER=chebyshev timeout 3600 python -u scripts/iters_to_tol.py 32 5 25 \
  > /tmp/tpu_runs/iters_cheb_incremental.log 2>&1
echo "iters cheb incremental exit=$?"

echo "=== isolation: incremental residual with the OLD power-30 estimator ==="
BENCH_SMOOTHER=chebyshev BENCH_LAM_METHOD=power \
  timeout 3600 python -u scripts/iters_to_tol.py 32 5 25 \
  > /tmp/tpu_runs/iters_cheb_incr_power.log 2>&1
echo "iters cheb incr power exit=$?"

echo "=== Krylov matvec at HIGH ==="
BENCH_KRYLOV_PRECISION=high timeout 3600 python -u bench.py \
  > /tmp/tpu_runs/bench_krylov_high.log 2>&1
echo "krylov high exit=$?"

echo "=== 2-step chebyshev under fmg_pcg ==="
BENCH_SMOOTH_STEPS=2 timeout 3600 python -u bench.py \
  > /tmp/tpu_runs/bench_steps2_pcg.log 2>&1
echo "steps2 exit=$?"

echo "=== stacked candidate: krylov high + bf16 directions ==="
BENCH_KRYLOV_PRECISION=high BENCH_DIRECTION_DTYPE=bfloat16 \
  timeout 3600 python -u bench.py > /tmp/tpu_runs/bench_stack.log 2>&1
echo "stack exit=$?"

echo "=== mixed-precision PCG retry: n=24 (80M) compiled to 17.51G — n=20 (46.5M) ==="
timeout 5400 python -u scripts/run_mixed_pcg.py 20 5 30 1e-10 \
  > /tmp/tpu_runs/mixed_pcg20.log 2>&1
echo "mixed pcg20 exit=$?"

echo "=== N=46 ceiling: bf16 dirs missed by only 93.84M under fmg_pcg ==="
echo "=== retry as plain V-cycles (no PCG state) on the incremental form ==="
BENCH_N=46 BENCH_SOLVE_MODE=vcycle BENCH_SMOOTHER=chebyshev \
  BENCH_DIRECTION_DTYPE=bfloat16 timeout 3600 python -u bench.py \
  > /tmp/tpu_runs/bench_n46_vcycle_bf16.log 2>&1
echo "n46 vcycle bf16 exit=$?"
