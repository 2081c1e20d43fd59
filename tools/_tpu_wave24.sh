#!/bin/bash
# Wave 24: validate the dx out_w-alignment fix on HW and re-baseline.
# A) dx attribution (expect the 12.25 ms valid kernels ~3-4 ms class)
# B) trainkern micro shootout (fwd/dx/dw per-conv)
# C) train-step bench (expect 304 -> ~260 ms)
# D) fixed flash blk sweep (%128 candidates, 48-chain)
# E) TPU numerics tier (grad tests on HW after the dx change)
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "[wave24] A: dx attribution"
timeout 2400 python tools/_trace_attrib.py dx > /tmp/q_trdx2.log 2>&1
echo "[wave24] A rc=$?"
sleep 30
echo "[wave24] B: trainkern"
timeout 2400 python tools/_exp_trainkern.py > /tmp/q_trainkern2.log 2>&1
echo "[wave24] B rc=$?"
sleep 30
echo "[wave24] C: train bench"
timeout 2400 python tools/_bench_train.py > /tmp/q_train5.log 2>&1
echo "[wave24] C rc=$?"
sleep 30
echo "[wave24] D: flash blk sweep (fixed)"
timeout 2400 python tools/_exp_flashblk.py > /tmp/q_flashblk2.log 2>&1
echo "[wave24] D rc=$?"
sleep 30
echo "[wave24] E: tpu tier"
ANATOMIX_TPU_TESTS=1 timeout 3600 python -m pytest tests/ -m tpu -q \
  > /tmp/q_tputests6.log 2>&1
echo "[wave24] E rc=$?"
echo "[wave24] done"
