#!/bin/bash
# Wave 36 (round 5): wide-assembly sparse kernel A/B (standalone + 6M
# fwd combos with the interleave exit), then the dev model with the
# winning gates (trace + sliding).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p tools/logs

echo "[wave36] A: wide kernel standalone + 6M fwd combos"
timeout 2400 python tools/_exp_wide.py > tools/logs/w36_wide.log 2>&1
echo "[wave36] A rc=$?"
sleep 10

echo "[wave36] B: dev fwd trace with WIDE=1 (+ interleave exit default)"
ANATOMIX_WIDE=1 timeout 1500 python tools/_trace_attrib.py dev \
  > tools/logs/w36_trdev.log 2>&1
echo "[wave36] B rc=$?"
sleep 10

echo "[wave36] C: dev sliding 256 with WIDE=1"
ANATOMIX_WIDE=1 timeout 1800 python tools/_exp_devsw1.py \
  > tools/logs/w36_devsw.log 2>&1
echo "[wave36] C rc=$?"
sleep 10

echo "[wave36] D: 6M sliding 256 (fold exit unaffected check) with WIDE=1"
ANATOMIX_WIDE=1 timeout 1800 python tools/_bench_sw2.py unet \
  > tools/logs/w36_sw6m.log 2>&1
echo "[wave36] D rc=$?"
echo "[wave36] done"
