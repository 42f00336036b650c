#!/bin/bash
# Round-4 queue, part F (reordered: default-deciding entries first, the
# TPU came back late in the round). Decides the composed production
# default for BENCH_r04; then bare-chebyshev coarse-leg isolation; then
# microtimings. steps2 alone already measured 3.82 s to 1e-3 (vs 4.46).
export HZT_TPU_QUEUE_MEMBER=1
rm -f /tmp/TPU_QUEUE_DONE
touch /tmp/TPU_QUEUE_RUNNING
trap 'rm -f /tmp/TPU_QUEUE_RUNNING; touch /tmp/TPU_QUEUE_DONE' EXIT
cd /root/repo
mkdir -p /tmp/tpu_runs

echo "=== baseline re-run: fmg_pcg default (same-session anchor) ==="
timeout 2400 python -u bench.py > /tmp/tpu_runs/bench_r4f_base.log 2>&1
echo "base exit=$?"

echo "=== steps2 + krylov high ==="
BENCH_SMOOTH_STEPS=2 BENCH_KRYLOV_PRECISION=high \
  timeout 2400 python -u bench.py > /tmp/tpu_runs/bench_steps2_khigh.log 2>&1
echo "steps2+khigh exit=$?"

echo "=== full stack + steps2: the composed candidate default ==="
BENCH_SMOOTH_STEPS=2 BENCH_KRYLOV_PRECISION=high BENCH_RESTRICT_PRECISION=high \
  BENCH_DIRECTION_DTYPE=bfloat16 timeout 2400 python -u bench.py \
  > /tmp/tpu_runs/bench_stack_steps2.log 2>&1
echo "stack steps2 exit=$?"

echo "=== full stack (steps3): krylov high + restrict high + bf16 directions ==="
BENCH_KRYLOV_PRECISION=high BENCH_RESTRICT_PRECISION=high \
  BENCH_DIRECTION_DTYPE=bfloat16 timeout 2400 python -u bench.py \
  > /tmp/tpu_runs/bench_stack2.log 2>&1
echo "stack2 exit=$?"

echo "=== restrict_precision=high alone ==="
BENCH_RESTRICT_PRECISION=high timeout 2400 python -u bench.py \
  > /tmp/tpu_runs/bench_restrict_high.log 2>&1
echo "restrict high exit=$?"

echo "=== steps1 (damped-Jacobi-degree smoother under the PCG outer) ==="
BENCH_SMOOTH_STEPS=1 timeout 2400 python -u bench.py \
  > /tmp/tpu_runs/bench_steps1.log 2>&1
echo "steps1 exit=$?"

echo "=== bare chebyshev: incremental + cg coarse (conjunction test) ==="
BENCH_SMOOTHER=chebyshev BENCH_COARSE=cg \
  timeout 2400 python -u scripts/iters_to_tol.py 32 5 25 \
  > /tmp/tpu_runs/iters_cheb_incr_cgcoarse.log 2>&1
echo "iters cheb incr cgcoarse exit=$?"

echo "=== bare chebyshev: incremental + mg coarse at tol 5e-3 ==="
BENCH_SMOOTHER=chebyshev BENCH_COARSE_MG_TOL=5e-3 \
  timeout 2400 python -u scripts/iters_to_tol.py 32 5 25 \
  > /tmp/tpu_runs/iters_cheb_incr_mgtol.log 2>&1
echo "iters cheb incr mgtol exit=$?"

echo "=== microtimings: chebyshev production iteration at 190M (part E) ==="
TC_SMOOTHER=chebyshev TC_SMOOTH_PRECISION=high TC_ORDER=type \
  timeout 2400 python -u scripts/time_coarse.py 32 \
  > /tmp/tpu_runs/time_cheb.log 2>&1
echo "time cheb exit=$?"
