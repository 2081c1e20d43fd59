#!/bin/bash
# Wave 13: second crash-bisect round — combination features.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
for p in probe_hbm_3dyn probe_alias_grid_overlap probe_roll_plus_dma; do
  echo "[wave13] $p"
  timeout 1200 python tools/_exp_scatterprobe.py $p > /tmp/q_$p.log 2>&1
  echo "[wave13] rc=$?"
  sleep 20
done
echo "[wave13] done"
