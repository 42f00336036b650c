#!/bin/bash
# Round-4 queue, part K: value-ordered re-run of the unexecuted parts I+J.
# Operational finding this session: the axon plugin does NOT persist the
# big solve-mode executables in the compilation cache (14 entries / 143 MB
# written, yet jit(body) recompiled from scratch on every attempt), so the
# 780 s kill-and-retry ratchet of part I can never converge for entries
# whose cold compile chain exceeds the window. Fix: generous timeouts,
# fewer attempts, highest-value entries first.
export HZT_TPU_QUEUE_MEMBER=1
export JAX_LOG_COMPILES=1
rm -f /tmp/TPU_QUEUE_DONE
touch /tmp/TPU_QUEUE_RUNNING
trap 'rm -f /tmp/TPU_QUEUE_RUNNING; touch /tmp/TPU_QUEUE_DONE' EXIT
cd /root/repo
mkdir -p /tmp/tpu_runs

run() {
  tag=$1; tmo=$2; attempts=$3; shift 3
  for attempt in $(seq 1 "$attempts"); do
    echo "=== $tag attempt $attempt $(date -u +%H:%M:%S) ==="
    timeout "$tmo" env "$@" >> /tmp/tpu_runs/$tag.log 2>&1
    rc=$?
    echo "$tag attempt $attempt exit=$rc"
    [ $rc -ne 124 ] && break
  done
}

# 1. Verdict item 4's TPU half: f64-depth mixed-precision PCG at 190M.
run mixed_pcg32 4500 2 python -u scripts/run_mixed_pcg.py 32 5 30 1e-10

# 2. Bare-cycle coarse-leg isolation (is the 1.9e-3 plateau the mg coarse
#    tolerance or the mg coarse itself?).
run iters_cheb_incr_mgtol 3000 2 BENCH_SMOOTHER=chebyshev BENCH_COARSE_MG_TOL=5e-3 \
  python -u scripts/iters_to_tol.py 32 5 25
run iters_cheb_incr_cgcoarse 3000 2 BENCH_SMOOTHER=chebyshev BENCH_COARSE=cg \
  python -u scripts/iters_to_tol.py 32 5 25

# 3. Production-iteration microtimings (where does the chebyshev PCG
#    iteration spend its 0.62 s?).
run time_cheb 3000 2 TC_SMOOTHER=chebyshev TC_SMOOTH_PRECISION=high TC_ORDER=type \
  python -u scripts/time_coarse.py 32

# 4. N=46 (566M) single-chip ceiling retries.
run bench_n46_bf16dir 3600 1 BENCH_N=46 BENCH_SMOOTHER=chebyshev \
  BENCH_DIRECTION_DTYPE=bfloat16 python -u bench.py
run bench_n46_platform 3600 1 XLA_PYTHON_CLIENT_ALLOCATOR=platform BENCH_N=46 \
  BENCH_SMOOTHER=chebyshev python -u bench.py

# 5. The part-I decision grid at N=16 (base's compiles are partially
#    cached from this session's attempts).
run bench16_base 1800 2 BENCH_N=16 python -u bench.py
run bench16_stack_steps2 1800 2 BENCH_N=16 BENCH_SMOOTH_STEPS=2 \
  BENCH_KRYLOV_PRECISION=high BENCH_RESTRICT_PRECISION=high \
  BENCH_DIRECTION_DTYPE=bfloat16 python -u bench.py
run bench16_stack_steps3 1800 2 BENCH_N=16 BENCH_KRYLOV_PRECISION=high \
  BENCH_RESTRICT_PRECISION=high BENCH_DIRECTION_DTYPE=bfloat16 python -u bench.py
run bench16_steps2 1800 2 BENCH_N=16 BENCH_SMOOTH_STEPS=2 python -u bench.py
