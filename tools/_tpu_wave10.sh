#!/bin/bash
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "[wave10] job A: scatter kernel probes (full kernel + bigroll)"
timeout 1800 python tools/_exp_scatterprobe.py probe_full > /tmp/q_sprobe3.log 2>&1
echo "[wave10] A rc=$?"
sleep 10
echo "[wave10] job B: scatter kernel validation + 6M sliding"
timeout 2400 python tools/_exp_scatter3.py > /tmp/q_scatter4.log 2>&1
echo "[wave10] B rc=$?"
sleep 5
echo "[wave10] job C: vit fwd trace (fresh attribution)"
timeout 2400 python tools/_trace_vit.py > /tmp/q_trvit5.log 2>&1
echo "[wave10] C rc=$?"
echo "[wave10] done"
