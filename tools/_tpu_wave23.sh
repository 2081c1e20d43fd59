#!/bin/bash
# Wave 23: wave-22 trace queue (dx/train/flash-blk/vit traces) followed by
# the OOM-fixed dev extraction Pareto (_bench_devfid2).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
bash tools/_tpu_wave22.sh
sleep 30
echo "[wave23] F: dev extraction Pareto (OOM-fixed)"
timeout 3600 python tools/_bench_devfid2.py > /tmp/q_devfid3.log 2>&1
echo "[wave23] F rc=$?"
echo "[wave23] done"
