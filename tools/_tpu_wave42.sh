#!/bin/bash
# Wave 42 (round 5): dx-kernel HW probe + train A/B.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p tools/logs

echo "[wave42] A: train A/B with DX_KERNEL=1"
ANATOMIX_DX_KERNEL=1 timeout 2400 python tools/_exp_trainblock.py \
  > tools/logs/w42_traindx.log 2>&1
echo "[wave42] A rc=$?"
sleep 10

echo "[wave42] B: train trace with DX_KERNEL=1"
ANATOMIX_DX_KERNEL=1 timeout 1800 python tools/_trace_attrib.py train \
  > tools/logs/w42_trtrain.log 2>&1
echo "[wave42] B rc=$?"
echo "[wave42] done"
