#!/bin/bash
# Wave 12: bisect the blend-scatter kernel crash — aligned-sublane DMA vs
# 4D-two-untiled-dyn DMA (each probe isolated so the crash point is clear).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "[wave12] job A: aligned-sublane dynamic DMA probe"
timeout 1200 python tools/_exp_scatterprobe.py probe_hbm_sublane_aligned > /tmp/q_sprobe5.log 2>&1
echo "[wave12] A rc=$?"
sleep 20
echo "[wave12] job B: 4D two-untiled-dyn DMA probe"
timeout 1200 python tools/_exp_scatterprobe.py probe_hbm_4d_untiled_dyn > /tmp/q_sprobe6.log 2>&1
echo "[wave12] B rc=$?"
echo "[wave12] done"
