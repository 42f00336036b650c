#!/bin/bash
# Round-4 queue, part D: leftovers (the r4c runner held the pre-edit inode,
# so the mixed-pcg retry queued mid-run lands here instead).
export HZT_TPU_QUEUE_MEMBER=1
rm -f /tmp/TPU_QUEUE_DONE
touch /tmp/TPU_QUEUE_RUNNING
trap 'rm -f /tmp/TPU_QUEUE_RUNNING; touch /tmp/TPU_QUEUE_DONE' EXIT
cd /root/repo
mkdir -p /tmp/tpu_runs

echo "=== mixed-precision PCG retry: n=24 (80M) compiled to 17.51G -> n=20 (46.5M) ==="
timeout 5400 python -u scripts/run_mixed_pcg.py 20 5 30 1e-10 \
  > /tmp/tpu_runs/mixed_pcg20.log 2>&1
echo "mixed pcg20 exit=$?"
