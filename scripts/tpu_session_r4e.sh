#!/bin/bash
# Round-4 queue, part E: microtiming budget of the production (chebyshev,
# mixed-precision) iteration — sizes the remaining levers (combine share,
# apply share, coarse) after the incremental-residual adoption.
export HZT_TPU_QUEUE_MEMBER=1
rm -f /tmp/TPU_QUEUE_DONE
touch /tmp/TPU_QUEUE_RUNNING
trap 'rm -f /tmp/TPU_QUEUE_RUNNING; touch /tmp/TPU_QUEUE_DONE' EXIT
cd /root/repo
mkdir -p /tmp/tpu_runs

echo "=== microtimings: chebyshev production iteration at 190M ==="
TC_SMOOTHER=chebyshev TC_SMOOTH_PRECISION=high TC_ORDER=type \
  timeout 3600 python -u scripts/time_coarse.py 32 \
  > /tmp/tpu_runs/time_cheb.log 2>&1
echo "time cheb exit=$?"
