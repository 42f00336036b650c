#!/bin/bash
# Round-4 queue, part F (runs after part C drains):
#   1. re-run of the part-C baseline (fmg_pcg default on the incremental
#      chebyshev) — the original entry died on a transient tunnel error
#      ("remote_compile: read body closed") before the first timing;
#   2. bare-chebyshev full-fix verification: incremental residuals +
#      Lanczos lam_max closed the 1.06 plateau (now reaches 1.9e-3, tail
#      0.999) and the pre-incremental cg-coarse diagnostic had tail 0.62 —
#      conjunction test: incremental + cg coarse should converge through
#      1e-3 at 190M;
#   3. same but keeping the mg coarse and tightening its tolerance 5e-2 ->
#      5e-3 (isolates "mg coarse is wrong" from "mg coarse is loose");
#   4. part E's microtimings of the production chebyshev iteration (its
#      waiter was lost in a session restart).
export HZT_TPU_QUEUE_MEMBER=1
rm -f /tmp/TPU_QUEUE_DONE
touch /tmp/TPU_QUEUE_RUNNING
trap 'rm -f /tmp/TPU_QUEUE_RUNNING; touch /tmp/TPU_QUEUE_DONE' EXIT
cd /root/repo
mkdir -p /tmp/tpu_runs

echo "=== baseline re-run: fmg_pcg default on the incremental chebyshev ==="
timeout 3600 python -u bench.py > /tmp/tpu_runs/bench_r4f_base.log 2>&1
echo "base exit=$?"

echo "=== bare chebyshev: incremental + cg coarse (conjunction test) ==="
BENCH_SMOOTHER=chebyshev BENCH_COARSE=cg \
  timeout 3600 python -u scripts/iters_to_tol.py 32 5 25 \
  > /tmp/tpu_runs/iters_cheb_incr_cgcoarse.log 2>&1
echo "iters cheb incr cgcoarse exit=$?"

echo "=== bare chebyshev: incremental + mg coarse at tol 5e-3 ==="
BENCH_SMOOTHER=chebyshev BENCH_COARSE_MG_TOL=5e-3 \
  timeout 3600 python -u scripts/iters_to_tol.py 32 5 25 \
  > /tmp/tpu_runs/iters_cheb_incr_mgtol.log 2>&1
echo "iters cheb incr mgtol exit=$?"

echo "=== restrict_precision=high A/B: the last HIGHEST applies are the ==="
echo "=== smoother entry residuals; incremental updates already bound the ==="
echo "=== drift, so HIGH entry may be convergence-neutral under the PCG outer ==="
BENCH_RESTRICT_PRECISION=high timeout 3600 python -u bench.py \
  > /tmp/tpu_runs/bench_restrict_high.log 2>&1
echo "restrict high exit=$?"

echo "=== full stack: krylov high + restrict high + bf16 directions ==="
BENCH_KRYLOV_PRECISION=high BENCH_RESTRICT_PRECISION=high \
  BENCH_DIRECTION_DTYPE=bfloat16 timeout 3600 python -u bench.py \
  > /tmp/tpu_runs/bench_stack2.log 2>&1
echo "stack2 exit=$?"

echo "=== steps2 + krylov high (steps2 measured 3.82 s to 1e-3 alone) ==="
BENCH_SMOOTH_STEPS=2 BENCH_KRYLOV_PRECISION=high \
  timeout 3600 python -u bench.py > /tmp/tpu_runs/bench_steps2_khigh.log 2>&1
echo "steps2+khigh exit=$?"

echo "=== full stack + steps2: the composed candidate default ==="
BENCH_SMOOTH_STEPS=2 BENCH_KRYLOV_PRECISION=high BENCH_RESTRICT_PRECISION=high \
  BENCH_DIRECTION_DTYPE=bfloat16 timeout 3600 python -u bench.py \
  > /tmp/tpu_runs/bench_stack_steps2.log 2>&1
echo "stack steps2 exit=$?"

echo "=== steps1 (damped-Jacobi-degree smoother under the PCG outer) ==="
BENCH_SMOOTH_STEPS=1 timeout 3600 python -u bench.py \
  > /tmp/tpu_runs/bench_steps1.log 2>&1
echo "steps1 exit=$?"

echo "=== microtimings: chebyshev production iteration at 190M (part E) ==="
TC_SMOOTHER=chebyshev TC_SMOOTH_PRECISION=high TC_ORDER=type \
  timeout 3600 python -u scripts/time_coarse.py 32 \
  > /tmp/tpu_runs/time_cheb.log 2>&1
echo "time cheb exit=$?"
