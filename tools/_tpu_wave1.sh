#!/bin/bash
# Round-3 TPU wave 1: waits for the axon relay, then runs jobs STRICTLY
# sequentially (the tunnel tolerates one client process at a time).
# Order per VERDICT r2: the -m tpu tier goes FIRST (item 3), then the
# attribution traces for the ViT forward (item 1), 6M sliding (item 2),
# and the pretraining step (item 5).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

echo "[wave1] waiting for relay..."
up=0
for i in $(seq 1 3600); do
  code=$(curl -s -m 5 http://127.0.0.1:8103/ -o /dev/null -w "%{http_code}" || true)
  if [ "$code" != "000" ]; then
    echo "[wave1] relay up (http $code) after ${i}x10s"
    up=1
    break
  fi
  sleep 10
done
if [ "$up" != "1" ]; then
  echo "[wave1] relay never came up; aborting"
  exit 7
fi

echo "[wave1] job A: real-TPU test tier"
ANATOMIX_TPU_TESTS=1 timeout 3000 python -m pytest tests/ -m tpu -q > /tmp/q_tputests.log 2>&1
echo "[wave1] A rc=$?"
sleep 5

echo "[wave1] job B: vit fwd trace"
timeout 1800 python tools/_trace_vit.py > /tmp/q_trvit.log 2>&1
echo "[wave1] B rc=$?"
sleep 5

echo "[wave1] job C: 6M sliding trace"
timeout 1800 python tools/_trace_sw.py > /tmp/q_trsw.log 2>&1
echo "[wave1] C rc=$?"
sleep 5

echo "[wave1] job D: train-step trace"
timeout 1800 python tools/_trace_train.py > /tmp/q_trtrain.log 2>&1
echo "[wave1] D rc=$?"
echo "[wave1] done"
