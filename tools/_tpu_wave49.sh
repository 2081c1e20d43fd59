#!/bin/bash
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p tools/logs

echo "[wave49] A: devtiled trace with NORM_KERNEL=1"
ANATOMIX_NORM_KERNEL=1 timeout 1800 python tools/_trace_attrib.py devtiled \
  > tools/logs/w49_trdevtiled.log 2>&1
echo "[wave49] A rc=$?"
sleep 10

echo "[wave49] B: dev fwd trace with NORM_KERNEL=1"
ANATOMIX_NORM_KERNEL=1 timeout 1500 python tools/_trace_attrib.py dev \
  > tools/logs/w49_trdev.log 2>&1
echo "[wave49] B rc=$?"
sleep 10

echo "[wave49] C: dev sliding with NORM_KERNEL=1"
ANATOMIX_NORM_KERNEL=1 timeout 1800 python tools/_exp_devsw1.py \
  > tools/logs/w49_devsw.log 2>&1
echo "[wave49] C rc=$?"
sleep 10

echo "[wave49] D: ViT fwd trace with NORM_KERNEL=1"
ANATOMIX_NORM_KERNEL=1 timeout 1500 python tools/_trace_attrib.py vitpacked \
  > tools/logs/w49_trvit.log 2>&1
echo "[wave49] D rc=$?"
echo "[wave49] done"
