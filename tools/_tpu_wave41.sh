#!/bin/bash
# Wave 41 (round 5): ViT glue probes + S2D_CONV entry A/B.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p tools/logs

echo "[wave41] A: ViT glue probes (one-hot s2d conv, decoder lane-slice)"
timeout 1800 python tools/_exp_vitglue.py > tools/logs/w41_vitglue.log 2>&1
echo "[wave41] A rc=$?"
sleep 10

echo "[wave41] B: 6M fwd with S2D_CONV entry"
ANATOMIX_S2D_CONV=1 timeout 1500 python tools/_exp_wide.py \
  > tools/logs/w41_s2dconv6m.log 2>&1
echo "[wave41] B rc=$?"
sleep 10

echo "[wave41] C: ViT packed fwd trace with S2D_CONV"
ANATOMIX_S2D_CONV=1 timeout 1500 python tools/_trace_attrib.py vitpacked \
  > tools/logs/w41_trvit.log 2>&1
echo "[wave41] C rc=$?"
echo "[wave41] done"
