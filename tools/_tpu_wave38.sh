#!/bin/bash
# Wave 38 (round 5): Winograd spike measurement, Pallas trilinear-emit
# probe + dev A/B, entry4 re-probe, HW test tier with the new defaults.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p tools/logs

echo "[wave38] A: Winograd F(2,3^3) spike (dev L1/L2 shapes)"
timeout 2400 python tools/_exp_winograd.py > tools/logs/w38_wg.log 2>&1
echo "[wave38] A rc=$?"
sleep 10

echo "[wave38] B: dev fwd trace with TRILIN_KERNEL=1"
ANATOMIX_TRILIN_KERNEL=1 timeout 1500 python tools/_trace_attrib.py dev \
  > tools/logs/w38_trdev.log 2>&1
echo "[wave38] B rc=$?"
sleep 10

echo "[wave38] C: dev sliding 256 with TRILIN_KERNEL=1"
ANATOMIX_TRILIN_KERNEL=1 timeout 1800 python tools/_exp_devsw1.py \
  > tools/logs/w38_devsw.log 2>&1
echo "[wave38] C rc=$?"
sleep 10

echo "[wave38] D: 6M fwd with ENTRY4 re-probe (wide+fold defaults)"
ANATOMIX_ENTRY4=1 timeout 1500 python tools/_exp_wide.py \
  > tools/logs/w38_entry4.log 2>&1
echo "[wave38] D rc=$?"
sleep 10

echo "[wave38] E: HW test tier (-m tpu) with round-5 defaults"
ANATOMIX_TPU_TESTS=1 timeout 3000 python -m pytest tests/ -m tpu -q \
  > tools/logs/w38_tputests.log 2>&1
echo "[wave38] E rc=$?"
echo "[wave38] done"

echo "[wave38] F: train step trace (lane-slice pool/concat + wide dx)"
timeout 1800 python tools/_trace_attrib.py train \
  > tools/logs/w38_trtrain.log 2>&1
echo "[wave38] F rc=$?"

echo "[wave38] G: train step A/B re-run"
timeout 2400 python tools/_exp_trainblock.py \
  > tools/logs/w38_trainblock.log 2>&1
echo "[wave38] G rc=$?"
echo "[wave38] all done"
