#!/bin/bash
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p tools/logs

echo "[wave48] A: dev full_tiled trace (even-tile IN fast path)"
timeout 1800 python tools/_trace_attrib.py devtiled \
  > tools/logs/w48_trdevtiled.log 2>&1
echo "[wave48] A rc=$?"
sleep 10

echo "[wave48] B: full bench (even-tile IN)"
timeout 2400 python bench.py > tools/logs/w48_bench.out 2> tools/logs/w48_bench.err
echo "[wave48] B rc=$?"
echo "[wave48] done"
