#!/bin/bash
# Stage-2 TPU jobs (run after _tpu_queue.sh): attribution traces.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

echo "[queue2] job 5: train-step trace"
timeout 1800 python tools/_trace_train.py > /tmp/q_trtrain.log 2>&1
echo "[queue2] job5 rc=$?"
sleep 5

echo "[queue2] job 6: vit fwd trace (B=1)"
timeout 1800 python tools/_trace_vit.py > /tmp/q_trvit.log 2>&1
echo "[queue2] job6 rc=$?"
sleep 5

echo "[queue2] job 7: double-buffered sparse conv"
timeout 1800 python tools/_exp_dbuf.py > /tmp/q_dbuf.log 2>&1
echo "[queue2] job7 rc=$?"
echo "[queue2] done"

echo "[queue2] job 8: gather strategy shootout"
timeout 1800 python tools/_exp_gather.py > /tmp/q_gather.log 2>&1
echo "[queue2] job8 rc=$?"
sleep 5

echo "[queue2] job 9: solver trace"
timeout 1800 python tools/_trace_solver.py > /tmp/q_trsolver.log 2>&1
echo "[queue2] job9 rc=$?"
echo "[queue2] done2"
