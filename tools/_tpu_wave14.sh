#!/bin/bash
# Wave 14: measure the round-3 ViT work — fwd trace, ViT sliding, 6M
# sliding re-check, then the new HW-tier kernel tests.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "[wave14] job A: ViT fwd trace (block-space tokenizer + fused demean)"
timeout 2400 python tools/_trace_vit.py > /tmp/q_trvit6.log 2>&1
echo "[wave14] A rc=$?"
sleep 10
echo "[wave14] job B: ViT 256 sliding + 6M sliding"
timeout 3000 python tools/_bench_sw2.py > /tmp/q_sw5.log 2>&1
echo "[wave14] B rc=$?"
sleep 10
echo "[wave14] job C: new HW-tier kernel tests"
ANATOMIX_TPU_TESTS=1 timeout 2400 python -m pytest tests/test_tpu_numerics.py -q -m tpu -k "down2 or d2s_fused" > /tmp/q_tputests3.log 2>&1
echo "[wave14] C rc=$?"
echo "[wave14] done"
