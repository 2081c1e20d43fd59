#!/bin/bash
# Wave 15: (A) full -m tpu tier incl. the new down2/d2s HW tests,
# (B) fresh ViT fwd trace post block-space down conv + fused demean,
# (C) roll+DMA probe, (D) roll-only scatter kernel HW validation +
# 6M sliding with the kernel, (E) reference sliding bench (kernel off).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "[wave15] A: full -m tpu tier"
ANATOMIX_TPU_TESTS=1 timeout 3000 python -m pytest tests/test_tpu_numerics.py -q -m tpu > /tmp/q_tputests4.log 2>&1
echo "[wave15] A rc=$?"
sleep 30
echo "[wave15] B: ViT fwd trace"
timeout 2400 python tools/_trace_vit.py > /tmp/q_trvit6.log 2>&1
echo "[wave15] B rc=$?"
sleep 30
echo "[wave15] C: roll+DMA probe"
timeout 600 python tools/_exp_scatterprobe.py probe_roll_plus_dma > /tmp/q_probe_roll2.log 2>&1
echo "[wave15] C rc=$?"
sleep 60
echo "[wave15] D: roll-only scatter kernel HW validation + 6M sliding"
timeout 2400 python tools/_exp_scatter3.py > /tmp/q_scatter6.log 2>&1
echo "[wave15] D rc=$?"
sleep 60
echo "[wave15] E: ViT 256 sliding + 6M sliding (default path)"
timeout 3000 python tools/_bench_sw2.py > /tmp/q_sw5.log 2>&1
echo "[wave15] E rc=$?"
echo "[wave15] done"
