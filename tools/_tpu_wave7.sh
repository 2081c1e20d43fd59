#!/bin/bash
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "[wave7] job A: scatter kernel HW validation + 6M sliding"
timeout 2400 python tools/_exp_scatter3.py > /tmp/q_scatter3.log 2>&1
echo "[wave7] A rc=$?"
sleep 5
echo "[wave7] job B: vit trace with fusion dumps"
timeout 2400 python tools/_trace_vit.py > /tmp/q_trvit4.log 2>&1
echo "[wave7] B rc=$?"
echo "[wave7] done"
