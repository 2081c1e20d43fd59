#!/bin/bash
# Wave 34 (round 4): HW probe of the two-operand cat kernel + flat
# trilinear stencil, then the dev fwd A/B and (if the probe is green)
# the reference-exact dev sliding with the winning combo.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p tools/logs

echo "[wave34] A: cat kernel HW probe (compile/parity/timing)"
timeout 1800 python tools/_probe_cat.py > tools/logs/w34_probecat.log 2>&1
rc_a=$?
echo "[wave34] A rc=$rc_a"
sleep 10

echo "[wave34] B: dev fwd A/B (base/cat/flat/cat+flat)"
timeout 2400 python tools/_exp_devfwd_ab.py > tools/logs/w34_devab.log 2>&1
echo "[wave34] B rc=$?"
sleep 10

if [ "$rc_a" = "0" ]; then
  echo "[wave34] C: dev sliding 256 with cat+flat"
  ANATOMIX_CAT_KERNEL=1 ANATOMIX_TRILIN_FLAT=1 timeout 1800 \
    python tools/_exp_devsw1.py > tools/logs/w34_devsw.log 2>&1
  echo "[wave34] C rc=$?"
  sleep 10

  echo "[wave34] D: dev fwd trace with cat+flat"
  ANATOMIX_CAT_KERNEL=1 ANATOMIX_TRILIN_FLAT=1 timeout 1500 \
    python tools/_trace_attrib.py dev > tools/logs/w34_trdev.log 2>&1
  echo "[wave34] D rc=$?"
else
  echo "[wave34] C/D skipped (probe failed)"
fi
sleep 10

echo "[wave34] E: 6M fused fwd trace (gap vs 5.8 ms floor)"
timeout 1500 python tools/_trace_attrib.py fused6 \
  > tools/logs/w34_trfused6.log 2>&1
echo "[wave34] E rc=$?"
echo "[wave34] done"
