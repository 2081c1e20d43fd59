#!/bin/bash
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p tools/logs

echo "[wave45] A: 6M fold fwd trace (lane-slice pool)"
timeout 1500 python tools/_trace_attrib.py fused6 \
  > tools/logs/w45_trfused6.log 2>&1
echo "[wave45] A rc=$?"
sleep 10

echo "[wave45] B: dev fwd trace (lane-slice pool)"
timeout 1500 python tools/_trace_attrib.py dev \
  > tools/logs/w45_trdev.log 2>&1
echo "[wave45] B rc=$?"
sleep 10

echo "[wave45] C: dev sliding"
timeout 1800 python tools/_exp_devsw1.py > tools/logs/w45_devsw.log 2>&1
echo "[wave45] C rc=$?"
sleep 10

echo "[wave45] D: 6M sliding"
timeout 1800 python tools/_bench_sw2.py unet > tools/logs/w45_sw6m.log 2>&1
echo "[wave45] D rc=$?"
echo "[wave45] done"
