#!/bin/bash
# Wave 18: (A) ref-level pack probes, (B) scatter v5 validation + RMW +
# 6M sliding w/ kernel, (C) full sliding bench kernel ON (now with
# fold-emit exits).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "[wave18] A: pack probes (ref-level)"
timeout 1800 python tools/_exp_pack2.py > /tmp/q_pack3.log 2>&1
echo "[wave18] A rc=$?"
sleep 30
echo "[wave18] B: scatter v5 HW validation"
timeout 2400 python tools/_exp_scatter3.py > /tmp/q_scatter9.log 2>&1
rcB=$?
echo "[wave18] B rc=$rcB"
sleep 30
if [ "$rcB" -eq 0 ]; then
  echo "[wave18] C: sliding bench, scatter kernel ON + fold exits"
  ANATOMIX_SCATTER_KERNEL=1 timeout 3000 python tools/_bench_sw2.py > /tmp/q_sw8.log 2>&1
  echo "[wave18] C rc=$?"
fi
echo "[wave18] done"
