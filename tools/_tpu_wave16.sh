#!/bin/bash
# Wave 16: (A) repack shootout, (B) scatter v3 HW validation + RMW +
# 6M sliding w/ kernel, (C) full sliding bench with the kernel ON.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "[wave16] A: repack shootout"
timeout 1800 python tools/_exp_repack.py > /tmp/q_repack.log 2>&1
echo "[wave16] A rc=$?"
sleep 30
echo "[wave16] B: scatter v3 HW validation"
timeout 2400 python tools/_exp_scatter3.py > /tmp/q_scatter7.log 2>&1
rcB=$?
echo "[wave16] B rc=$rcB"
sleep 60
if [ "$rcB" -eq 0 ]; then
  echo "[wave16] C: sliding bench, scatter kernel ON"
  ANATOMIX_SCATTER_KERNEL=1 timeout 3000 python tools/_bench_sw2.py > /tmp/q_sw6.log 2>&1
  echo "[wave16] C rc=$?"
fi
echo "[wave16] done"
