#!/bin/bash
# Wave 17: (A) scatter v4 HW validation + RMW + 6M sliding w/ kernel,
# (B) pack probes (strided slice / concat / d2s_fold), (C) sliding
# bench with the kernel ON (6M + ViT).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "[wave17] A: scatter v4 HW validation"
timeout 2400 python tools/_exp_scatter3.py > /tmp/q_scatter8.log 2>&1
rcA=$?
echo "[wave17] A rc=$rcA"
sleep 30
echo "[wave17] B: pack probes"
timeout 1800 python tools/_exp_pack2.py > /tmp/q_pack2.log 2>&1
echo "[wave17] B rc=$?"
sleep 30
if [ "$rcA" -eq 0 ]; then
  echo "[wave17] C: sliding bench, scatter kernel ON"
  ANATOMIX_SCATTER_KERNEL=1 timeout 3000 python tools/_bench_sw2.py > /tmp/q_sw7.log 2>&1
  echo "[wave17] C rc=$?"
fi
echo "[wave17] done"
