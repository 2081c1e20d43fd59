#!/bin/bash
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p tools/logs

echo "[wave47] A: dev full_tiled 256 trace"
timeout 1800 python tools/_trace_attrib.py devtiled \
  > tools/logs/w47_trdevtiled.log 2>&1
echo "[wave47] A rc=$?"
sleep 10

echo "[wave47] B: full bench (parting record)"
timeout 2400 python bench.py > tools/logs/w47_bench.out 2> tools/logs/w47_bench.err
echo "[wave47] B rc=$?"
echo "[wave47] done"
