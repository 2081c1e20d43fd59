#!/bin/bash
# Wave 37 (round 5): wide kernels for skip/cat + fold-exit fwd metric +
# block-space train walk — full A/B on hardware.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p tools/logs

echo "[wave37] A: wide kernels + 6M fwd (narrow/wide x spatial/fold)"
timeout 2400 python tools/_exp_wide.py > tools/logs/w37_wide.log 2>&1
echo "[wave37] A rc=$?"
sleep 10

echo "[wave37] B: train step A/B (per-conv vs block walk)"
timeout 2400 python tools/_exp_trainblock.py \
  > tools/logs/w37_trainblock.log 2>&1
echo "[wave37] B rc=$?"
sleep 10

echo "[wave37] C: dev fwd trace WIDE=1 (cat-wide + skip demotions)"
ANATOMIX_WIDE=1 timeout 1500 python tools/_trace_attrib.py dev \
  > tools/logs/w37_trdev.log 2>&1
echo "[wave37] C rc=$?"
sleep 10

echo "[wave37] D: dev sliding 256 WIDE=1"
ANATOMIX_WIDE=1 timeout 1800 python tools/_exp_devsw1.py \
  > tools/logs/w37_devsw.log 2>&1
echo "[wave37] D rc=$?"
sleep 10

echo "[wave37] E: 6M sliding 256 WIDE=1"
ANATOMIX_WIDE=1 timeout 1800 python tools/_bench_sw2.py unet \
  > tools/logs/w37_sw6m.log 2>&1
echo "[wave37] E rc=$?"
sleep 10

echo "[wave37] F: train step trace (block walk)"
timeout 1800 python tools/_trace_attrib.py train \
  > tools/logs/w37_trtrain.log 2>&1
echo "[wave37] F rc=$?"
echo "[wave37] done"
