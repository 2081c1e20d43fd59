#!/bin/bash
# Waits for the axon relay, then runs the queued TPU jobs STRICTLY
# sequentially (the tunnel tolerates one client process at a time).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

echo "[queue] waiting for relay..."
for i in $(seq 1 2520); do
  code=$(curl -s -m 5 http://127.0.0.1:8103/ -o /dev/null -w "%{http_code}" || true)
  if [ "$code" != "000" ]; then
    echo "[queue] relay up (http $code) after ${i}x10s"
    break
  fi
  sleep 10
done

echo "[queue] job 1: sliding measurements (unet)"
timeout 2400 python tools/_bench_sw2.py unet > /tmp/q_sw2u.log 2>&1
echo "[queue] job1 rc=$?"
sleep 5

echo "[queue] job 2: sliding measurements (vit)"
timeout 2400 python tools/_bench_sw2.py vit > /tmp/q_sw2v.log 2>&1
echo "[queue] job2 rc=$?"
sleep 5

echo "[queue] job 3: real-TPU test tier"
ANATOMIX_TPU_TESTS=1 timeout 2400 python -m pytest tests/ -m tpu -q > /tmp/q_tputests.log 2>&1
echo "[queue] job3 rc=$?"
sleep 5

echo "[queue] job 4: full bench"
timeout 2400 python bench.py > /tmp/q_bench.out 2> /tmp/q_bench.err
echo "[queue] job4 rc=$?"
echo "[queue] done"
