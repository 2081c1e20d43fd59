#!/bin/bash
# Wave 21: (0) fold HW compile probe (wave-20 Mosaic fixes), then if OK
# (A) sliding bench kernel+fold ON (6M + ViT), (B) 6M sliding
# attribution, (C) ViT fwd re-measure (cln dtype change), (D) dev
# extraction Pareto (overlap sweep + full_tiled cosine).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "[wave21] 0: fold probe"
timeout 1200 python tools/_probe_fold.py > /tmp/q_foldprobe.log 2>&1
rc=$?
echo "[wave21] 0 rc=$rc"
sleep 30
if [ "$rc" -eq 0 ]; then
  echo "[wave21] A: sliding bench, scatter kernel ON"
  ANATOMIX_SCATTER_KERNEL=1 timeout 3000 python tools/_bench_sw2.py > /tmp/q_sw10.log 2>&1
  echo "[wave21] A rc=$?"
  sleep 30
  echo "[wave21] B: 6M sliding attribution, kernel ON"
  ANATOMIX_SCATTER_KERNEL=1 timeout 2400 python tools/_trace_attrib.py sw > /tmp/q_trsw4.log 2>&1
  echo "[wave21] B rc=$?"
  sleep 30
else
  echo "[wave21] fold probe failed; skipping kernel-ON runs"
fi
echo "[wave21] C: ViT fwd batch timing"
timeout 2400 python tools/_exp_vitb.py > /tmp/q_vitb2.log 2>&1
echo "[wave21] C rc=$?"
sleep 30
echo "[wave21] D: dev extraction Pareto"
timeout 3600 python tools/_bench_devfid2.py > /tmp/q_devfid2.log 2>&1
echo "[wave21] D rc=$?"
echo "[wave21] done"
