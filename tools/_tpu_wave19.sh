#!/bin/bash
# Wave 19: (A) scatter v5 HW validation + RMW + 6M sliding w/ kernel,
# (B) sliding bench kernel ON (fold exits), (C) ViT + sliding source
# attribution traces.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "[wave19] A: scatter v5 HW validation"
timeout 2400 python tools/_exp_scatter3.py > /tmp/q_scatter10.log 2>&1
rcA=$?
echo "[wave19] A rc=$rcA"
sleep 30
if [ "$rcA" -eq 0 ]; then
  echo "[wave19] B: sliding bench, scatter kernel ON + fold exits"
  ANATOMIX_SCATTER_KERNEL=1 timeout 3000 python tools/_bench_sw2.py > /tmp/q_sw8.log 2>&1
  echo "[wave19] B rc=$?"
  sleep 30
fi
echo "[wave19] C: ViT fwd source attribution"
timeout 2400 python tools/_trace_attrib.py vit > /tmp/q_trvit7.log 2>&1
echo "[wave19] C rc=$?"
sleep 30
echo "[wave19] D: 6M sliding attribution (kernel ON)"
ANATOMIX_SCATTER_KERNEL=1 timeout 2400 python tools/_trace_attrib.py sw > /tmp/q_trsw2.log 2>&1
echo "[wave19] D rc=$?"
echo "[wave19] done"
