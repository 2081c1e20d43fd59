#!/bin/bash
# Round-3 TPU wave 2: strictly sequential jobs (one tunnel client at a time).
# A: re-run the -m tpu tier after the f32-precision fix (c1c46e5) — need a
#    green run on record (VERDICT item 3).
# B: ViT fwd @128^3 with the fused block-space tokenizer (a76fd8d).
# C: patch-sampling shootout (choice vs gumbel top-k) for the train step.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

echo "[wave2] waiting for relay..."
up=0
for i in $(seq 1 360); do
  code=$(curl -s -m 5 http://127.0.0.1:8103/ -o /dev/null -w "%{http_code}" || true)
  if [ "$code" != "000" ]; then
    echo "[wave2] relay up (http $code) after ${i}x10s"
    up=1
    break
  fi
  sleep 10
done
if [ "$up" != "1" ]; then
  echo "[wave2] relay never came up; aborting"
  exit 7
fi

echo "[wave2] job A: real-TPU test tier (post f32 fix)"
ANATOMIX_TPU_TESTS=1 timeout 3000 python -m pytest tests/ -m tpu -q > /tmp/q_tputests2.log 2>&1
echo "[wave2] A rc=$?"
sleep 5

echo "[wave2] job B: vit fwd (fused tokenizer)"
timeout 1800 python tools/_bench_vit.py > /tmp/q_vitfwd2.log 2>&1
echo "[wave2] B rc=$?"
sleep 5

echo "[wave2] job C: sampling shootout"
timeout 1200 python tools/_exp_sample.py > /tmp/q_sample3.log 2>&1
echo "[wave2] C rc=$?"
echo "[wave2] done"
