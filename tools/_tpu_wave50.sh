#!/bin/bash
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p tools/logs

echo "[wave50] A: HW tier (-m tpu) final defaults"
ANATOMIX_TPU_TESTS=1 timeout 3000 python -m pytest tests/ -m tpu -q \
  > tools/logs/w50_tputests.log 2>&1
echo "[wave50] A rc=$?"
sleep 10

echo "[wave50] B: full bench (final)"
timeout 2400 python bench.py > tools/logs/w50_bench.out 2> tools/logs/w50_bench.err
echo "[wave50] B rc=$?"
echo "[wave50] done"
