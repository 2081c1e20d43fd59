#!/bin/bash
# Wave 26 (round 4): validate the 192-extent guard, pick the flash block
# size, measure its ViT impact, refresh the train-step breakdown, and run
# the long-queued dev extraction Pareto. Logs persist in tools/logs/.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
L=tools/logs
echo "[wave26] A: reg192 probe (extent guard)"
timeout 2400 python tools/_probe_reg192.py 192 > $L/w26_probe192.log 2>&1
echo "[wave26] A rc=$?"
sleep 20
echo "[wave26] B: flash blk confirm sweep"
timeout 2400 python tools/_exp_flashblk.py > $L/w26_flashblk.log 2>&1
echo "[wave26] B rc=$?"
sleep 20
echo "[wave26] C1: ViT fwd + sliding at FLASH_BLK=1408"
{ ANATOMIX_FLASH_BLK=1408 timeout 1200 python tools/_bench_vit.py && \
  ANATOMIX_FLASH_BLK=1408 timeout 2400 python tools/_bench_sw2.py vit; } \
  > $L/w26_vit1408.log 2>&1
echo "[wave26] C1 rc=$?"
sleep 20
echo "[wave26] C2: ViT fwd + sliding at FLASH_BLK=4224"
{ ANATOMIX_FLASH_BLK=4224 timeout 1200 python tools/_bench_vit.py && \
  ANATOMIX_FLASH_BLK=4224 timeout 2400 python tools/_bench_sw2.py vit; } \
  > $L/w26_vit4224.log 2>&1
echo "[wave26] C2 rc=$?"
sleep 20
echo "[wave26] D: train-step attribution (current state)"
timeout 2400 python tools/_trace_attrib.py train > $L/w26_trtrain.log 2>&1
echo "[wave26] D rc=$?"
sleep 20
echo "[wave26] E: dev 94M extraction Pareto (wave-23 F, never ran)"
timeout 3600 python tools/_bench_devfid2.py > $L/w26_devfid.log 2>&1
echo "[wave26] E rc=$?"
echo "[wave26] done"
