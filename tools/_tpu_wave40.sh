#!/bin/bash
# Wave 40 (round 5): re-measure ViT + dev + 6M with the lane-wise IN
# stats fix; trace the 6M fold forward for the last glue items.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p tools/logs

echo "[wave40] A: ViT packed+spatial fwd trace (lane-wise IN stats)"
timeout 1500 python tools/_trace_attrib.py vitpacked \
  > tools/logs/w40_trvit.log 2>&1
echo "[wave40] A rc=$?"
sleep 10

echo "[wave40] B: dev fwd trace (lane-wise IN stats)"
timeout 1500 python tools/_trace_attrib.py dev \
  > tools/logs/w40_trdev.log 2>&1
echo "[wave40] B rc=$?"
sleep 10

echo "[wave40] C: dev sliding 256"
timeout 1800 python tools/_exp_devsw1.py > tools/logs/w40_devsw.log 2>&1
echo "[wave40] C rc=$?"
sleep 10

echo "[wave40] D: 6M fused-fold fwd trace (remaining glue)"
timeout 1500 python tools/_trace_attrib.py fused6 \
  > tools/logs/w40_trfused6.log 2>&1
echo "[wave40] D rc=$?"
echo "[wave40] done"
