#!/bin/bash
# Wave 31 (round 4): validate the two r04 fixes on HW, then the full
# bench + the deferred wave-30 attribution traces / flash sweep.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p tools/logs

echo "[wave31] A: ViT bench-section smoke (prepacked extractor fix)"
timeout 1500 python tools/_smoke_vitbench.py > tools/logs/w31_vitsmoke.log 2>&1
echo "[wave31] A rc=$?"
sleep 10

echo "[wave31] B: real-TPU test tier (conv_down guard fix)"
ANATOMIX_TPU_TESTS=1 timeout 2400 python -m pytest tests/ -m tpu -q \
  > tools/logs/w31_tputests.log 2>&1
echo "[wave31] B rc=$?"
sleep 10

echo "[wave31] C: FULL bench.py"
timeout 1800 python bench.py > tools/logs/w31_bench.log 2>&1
echo "[wave31] C rc=$?"
sleep 10

echo "[wave31] D: packed fwd trace, stage decoder (gate 0)"
ANATOMIX_DECODER_BLOCK=0 timeout 1200 python tools/_trace_attrib.py vitpacked \
  > tools/logs/w31_trpacked0.log 2>&1
echo "[wave31] D rc=$?"
sleep 10

echo "[wave31] E: packed fwd trace, block-space decoder (gate 1)"
ANATOMIX_DECODER_BLOCK=1 timeout 1200 python tools/_trace_attrib.py vitpacked \
  > tools/logs/w31_trpacked1.log 2>&1
echo "[wave31] E rc=$?"
sleep 10

echo "[wave31] F: flash rectangular-block + splash sweep"
timeout 2400 python tools/_exp_flashblk.py > tools/logs/w31_flash.log 2>&1
echo "[wave31] F rc=$?"
echo "[wave31] done"
