#!/bin/bash
# Round-4 queue, part J (chains after the part-I decision grid): the
# at-scale records that still lack a TPU execution — mixed-precision PCG
# at 190M (verdict item 4's TPU half), the two N=46 ceiling retries, the
# bare-chebyshev coarse-leg isolation (is the 1.9e-3 plateau the mg
# coarse tolerance or the mg coarse itself?), and the production-
# iteration microtimings. Retry ratchet on timeouts only (the persistent
# compile cache makes retries cheap); non-timeout failures (e.g. the
# expected N=46 OOM) are recorded and not retried.
export HZT_TPU_QUEUE_MEMBER=1
export JAX_LOG_COMPILES=1
rm -f /tmp/TPU_QUEUE_DONE
touch /tmp/TPU_QUEUE_RUNNING
trap 'rm -f /tmp/TPU_QUEUE_RUNNING; touch /tmp/TPU_QUEUE_DONE' EXIT
cd /root/repo
mkdir -p /tmp/tpu_runs

run() {
  tag=$1; tmo=$2; shift 2
  for attempt in 1 2 3 4; do
    echo "=== $tag attempt $attempt ==="
    timeout "$tmo" env "$@" >> /tmp/tpu_runs/$tag.log 2>&1
    rc=$?
    echo "$tag attempt $attempt exit=$rc"
    [ $rc -ne 124 ] && break
  done
}

run mixed_pcg32 3600 python -u scripts/run_mixed_pcg.py 32 5 30 1e-10
if grep -aq "RESOURCE_EXHAUSTED\|out of memory\|OOM" /tmp/tpu_runs/mixed_pcg32.log; then
  run mixed_pcg24 3600 python -u scripts/run_mixed_pcg.py 24 5 30 1e-10
fi

run iters_cheb_incr_cgcoarse 2400 BENCH_SMOOTHER=chebyshev BENCH_COARSE=cg \
  python -u scripts/iters_to_tol.py 32 5 25
run iters_cheb_incr_mgtol 2400 BENCH_SMOOTHER=chebyshev BENCH_COARSE_MG_TOL=5e-3 \
  python -u scripts/iters_to_tol.py 32 5 25

run time_cheb 2400 TC_SMOOTHER=chebyshev TC_SMOOTH_PRECISION=high TC_ORDER=type \
  python -u scripts/time_coarse.py 32

run bench_n46_bf16dir 3600 BENCH_N=46 BENCH_SMOOTHER=chebyshev \
  BENCH_DIRECTION_DTYPE=bfloat16 python -u bench.py
run bench_n46_platform 3600 XLA_PYTHON_CLIENT_ALLOCATOR=platform BENCH_N=46 \
  BENCH_SMOOTHER=chebyshev python -u bench.py
