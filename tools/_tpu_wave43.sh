#!/bin/bash
# Wave 43 (round 5 close): HW tier + full bench at final defaults.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p tools/logs

echo "[wave43] A: HW test tier (-m tpu)"
ANATOMIX_TPU_TESTS=1 timeout 3000 python -m pytest tests/ -m tpu -q \
  > tools/logs/w43_tputests.log 2>&1
echo "[wave43] A rc=$?"
sleep 10

echo "[wave43] B: full bench (final defaults)"
timeout 2400 python bench.py > tools/logs/w43_bench.out 2> tools/logs/w43_bench.err
echo "[wave43] B rc=$?"
echo "[wave43] done"
