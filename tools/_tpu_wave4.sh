#!/bin/bash
# Round-3 TPU wave 4: 6M sliding with the halo kernels, emit_full off/on
# (the exit-d2s relayout only exists in the sliding graph, so emit_full's
# fwd-context negative result may invert here).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

echo "[wave4] job A: 6M sliding, emit_full=0"
ANATOMIX_EMIT_FULL=0 timeout 2400 python tools/_bench_sw2.py unet > /tmp/q_sw4a.log 2>&1
echo "[wave4] A rc=$?"
sleep 5

echo "[wave4] job B: 6M sliding, emit_full=1"
ANATOMIX_EMIT_FULL=1 timeout 2400 python tools/_bench_sw2.py unet > /tmp/q_sw4b.log 2>&1
echo "[wave4] B rc=$?"
echo "[wave4] done"
