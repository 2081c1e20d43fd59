#!/bin/bash
# Wave 32 (round 4): dev-94M sliding levers — per-window fused fwd
# source attribution + sw_batch sweep of the reference-exact sliding.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p tools/logs

echo "[wave32] A: dev 94M fused fwd trace @128"
timeout 1500 python tools/_trace_attrib.py dev > tools/logs/w32_trdev.log 2>&1
echo "[wave32] A rc=$?"
sleep 10

echo "[wave32] B: dev sliding sw_batch sweep"
timeout 2400 python tools/_exp_devsw.py > tools/logs/w32_devsw.log 2>&1
echo "[wave32] B rc=$?"
echo "[wave32] done"
