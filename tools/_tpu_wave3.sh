#!/bin/bash
# Round-3 TPU wave 3: strictly sequential jobs.
# A: in-kernel halo kernels — Mosaic compile + parity + timings (gates
#    everything downstream of the sparse convs).
# B: pretrain step with the Gumbel top-k sampler.
# C: ViT forward attribution trace with the fused tokenizer (diagnose the
#    49.3 ms regression vs 34.4 XLA-tokenizer baseline).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

echo "[wave3] waiting for relay..."
up=0
for i in $(seq 1 360); do
  code=$(curl -s -m 5 http://127.0.0.1:8103/ -o /dev/null -w "%{http_code}" || true)
  if [ "$code" != "000" ]; then
    echo "[wave3] relay up (http $code) after ${i}x10s"
    up=1
    break
  fi
  sleep 10
done
if [ "$up" != "1" ]; then
  echo "[wave3] relay never came up; aborting"
  exit 7
fi

echo "[wave3] job A: halo kernel HW validation"
timeout 2400 python tools/_exp_halo.py > /tmp/q_halo.log 2>&1
echo "[wave3] A rc=$?"
sleep 5

echo "[wave3] job B: pretrain step (gumbel sampler)"
timeout 2400 python tools/_bench_train.py > /tmp/q_train3.log 2>&1
echo "[wave3] B rc=$?"
sleep 5

echo "[wave3] job C: vit fwd trace (fused tokenizer)"
timeout 2400 python tools/_trace_vit.py > /tmp/q_trvit3.log 2>&1
echo "[wave3] C rc=$?"
echo "[wave3] done"
