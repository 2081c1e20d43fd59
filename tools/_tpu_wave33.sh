#!/bin/bash
# Wave 33 (round 4): measure the block-layout trilinear decoder
# (102dba6) — dev fused fwd attribution + reference-exact dev sliding —
# then the HW test tier and a full bench (BENCH_r04 budget rehearsal).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p tools/logs

echo "[wave33] A: dev 94M fused fwd trace @128 (trilinear-block)"
timeout 1500 python tools/_trace_attrib.py dev > tools/logs/w33_trdev.log 2>&1
echo "[wave33] A rc=$?"
sleep 10

echo "[wave33] B: dev sliding 256 (reference-exact, sw_batch=2)"
timeout 1800 python tools/_exp_devsw1.py > tools/logs/w33_devsw.log 2>&1
echo "[wave33] B rc=$?"
sleep 10

echo "[wave33] C: real-TPU test tier"
ANATOMIX_TPU_TESTS=1 timeout 2400 python -m pytest tests/ -m tpu -q \
  > tools/logs/w33_tputests.log 2>&1
echo "[wave33] C rc=$?"
sleep 10

echo "[wave33] D: full bench"
timeout 2000 python bench.py > tools/logs/w33_bench.log 2>&1
echo "[wave33] D rc=$?"
echo "[wave33] done"
